"""Encoder configuration: flat config struct, presets, validation.

Analog of vvenc's vvencCfg (include/vvenc/vvencCfg.h:424, vvencCfg.cpp
presets at :2577) re-shaped for this framework: a dataclass with the same
conceptual knobs, preset matrices that enable tools per quality tier, and a
derivation/validation pass.
"""

from .config import VvencTpuConfig, Preset, init_preset, check_config
