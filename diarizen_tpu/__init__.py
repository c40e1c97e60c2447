"""diarizen_tpu: a TPU-native (JAX/XLA/Pallas) speaker diarization framework.

Capabilities mirror BUTSpeechFIT/DiariZen (see SURVEY.md): an EEND-style local
segmentation model (WavLM + Conformer + powerset head), sliding-window inference
with overlap-add stitching, global speaker clustering (AHC / VBx) over WeSpeaker
ResNet34 embeddings, distributed training, and structured pruning + distillation.

The compute path is pure JAX (jit/pjit over a device mesh); host-side
orchestration (window stitching, clustering, RTTM io) is numpy.
"""

__version__ = "0.1.0"
