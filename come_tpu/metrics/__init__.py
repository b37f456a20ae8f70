from come_tpu.metrics.meters import ThroughputMeter, ScalarLog

__all__ = ["ThroughputMeter", "ScalarLog"]
