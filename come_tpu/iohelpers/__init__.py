from come_tpu.iohelpers.persist import (
    save_embedding_word2vec,
    load_embedding_word2vec,
    save_checkpoint,
    load_checkpoint,
    load_host_key,
    save_checkpoint_sharded,
    load_checkpoint_sharded,
    load_checkpoint_global,
    load_checkpoint_meta,
)

__all__ = [
    "save_embedding_word2vec",
    "load_embedding_word2vec",
    "save_checkpoint",
    "load_checkpoint",
    "load_host_key",
    "save_checkpoint_sharded",
    "load_checkpoint_sharded",
    "load_checkpoint_global",
    "load_checkpoint_meta",
]
