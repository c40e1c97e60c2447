from diarizen_tpu.infer.pipeline import (
    DiarizationPipeline,
    EmbeddingInference,
    reconstruct,
    speaker_count,
    to_diarization,
)
from diarizen_tpu.infer.sliding import SlidingInference, receptive_field_window

__all__ = [
    "DiarizationPipeline", "EmbeddingInference", "reconstruct",
    "speaker_count", "to_diarization", "SlidingInference",
    "receptive_field_window",
]
