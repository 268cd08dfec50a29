from .transformer import DecoderConfig, forward, init_params, init_cache, param_count
from .presets import resolve_base_config, PRESETS
from .unit_lm import UnitLM, UnitLMConfig, tlm_factory
from .generate import generate
from .speech_lm import SpeechLM

__all__ = [
    "DecoderConfig", "forward", "init_params", "init_cache", "param_count",
    "resolve_base_config", "PRESETS",
    "UnitLM", "UnitLMConfig", "tlm_factory", "generate", "SpeechLM",
]
