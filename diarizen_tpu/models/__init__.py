from diarizen_tpu.models.wavlm import WavLMConfig, init_wavlm_params, wavlm_extract_features

__all__ = ["WavLMConfig", "init_wavlm_params", "wavlm_extract_features"]
