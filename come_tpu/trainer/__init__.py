from come_tpu.trainer.come import ComETrainer, TrainState

__all__ = ["ComETrainer", "TrainState"]
