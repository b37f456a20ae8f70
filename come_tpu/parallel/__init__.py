from come_tpu.parallel.mesh import make_mesh, MeshLayout
from come_tpu.parallel.sharded import ShardedComETrainer

__all__ = ["make_mesh", "MeshLayout", "ShardedComETrainer"]
