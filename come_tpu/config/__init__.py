from come_tpu.config.presets import ComEConfig, PRESETS, get_config

__all__ = ["ComEConfig", "PRESETS", "get_config"]
