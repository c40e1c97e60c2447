from diarizen_tpu.infer.multilabel import MultiLabelSegmentation
from diarizen_tpu.infer.pipeline import (
    DiarizationPipeline,
    EmbeddingInference,
    reconstruct,
    speaker_count,
    to_diarization,
)
from diarizen_tpu.infer.resegmentation import Resegmentation
from diarizen_tpu.infer.sliding import SlidingInference, receptive_field_window
from diarizen_tpu.infer.vad import OverlappedSpeechDetection, VoiceActivityDetection

__all__ = [
    "DiarizationPipeline", "EmbeddingInference", "reconstruct",
    "speaker_count", "to_diarization", "SlidingInference",
    "receptive_field_window", "Resegmentation", "MultiLabelSegmentation",
    "VoiceActivityDetection", "OverlappedSpeechDetection",
]
