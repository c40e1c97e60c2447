from diarizen_tpu.core.segments import (
    Segment,
    Timeline,
    Annotation,
    SlidingWindow,
    SlidingWindowFeature,
)

__all__ = [
    "Segment",
    "Timeline",
    "Annotation",
    "SlidingWindow",
    "SlidingWindowFeature",
]
