"""Uniform segmentation-forward dispatch across model families.

Every EEND family (WavLM+Conformer, Fbank+Conformer, SincNet-BiLSTM, MC)
exposes the same normalized signature through `segmentation_forward(cfg)`:

    fwd(params, model_state, cfg, waveforms, *, train, rng, compute_dtype)
        -> (log-powerset scores (B, F, P), new_model_state)

so the Trainer steps (train/step.py) and the sliding-window engine
(infer/sliding.py) work for any family — the reference gets this from its
common `Model` base class (pyannote core/model.py); here it is a config-type
dispatch over pure functions.
"""

from __future__ import annotations

from typing import Callable


def segmentation_forward(cfg) -> Callable:
    """Return the normalized forward for a segmentation config object."""
    from diarizen_tpu.models.eend import EendConfig, eend_forward

    if type(cfg) is EendConfig:
        return eend_forward

    from diarizen_tpu.models.fbank_eend import FbankEendConfig, fbank_eend_forward

    if isinstance(cfg, FbankEendConfig):
        return fbank_eend_forward

    from diarizen_tpu.models.sincnet_eend import (
        SincNetEendConfig,
        sincnet_eend_forward,
    )

    if isinstance(cfg, SincNetEendConfig):

        def fwd(params, model_state, cfg, waveforms, *, train=False, rng=None,
                compute_dtype=None):
            del compute_dtype  # LSTM scan runs f32
            scores = sincnet_eend_forward(
                params, cfg, waveforms, train=train, rng=rng
            )
            return scores, model_state

        return fwd

    from diarizen_tpu.models.mc import McEendConfig, eend_mc_forward

    if isinstance(cfg, McEendConfig):

        def mc_fwd(params, model_state, cfg, waveforms, *, train=False, rng=None,
                   compute_dtype=None):
            kwargs = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
            scores, _att, new_ms = eend_mc_forward(
                params, model_state, cfg, cfg.fusion, waveforms,
                train=train, rng=rng, **kwargs,
            )
            return scores, new_ms

        return mc_fwd

    raise TypeError(f"no segmentation forward for config type {type(cfg)!r}")
