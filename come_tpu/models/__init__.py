from come_tpu.models.state import ComEParams, init_params

__all__ = ["ComEParams", "init_params"]
