from come_tpu.graphs.csr import CSRGraph, DeviceCSR
from come_tpu.graphs.loaders import (
    load_adjacencylist,
    load_edgelist,
    load_matfile,
)
from come_tpu.graphs.generators import dc_sbm_graph, sbm_graph, powerlaw_graph
from come_tpu.graphs.datasets import get_dataset, DATASETS

__all__ = [
    "CSRGraph",
    "DeviceCSR",
    "load_adjacencylist",
    "load_edgelist",
    "load_matfile",
    "dc_sbm_graph",
    "sbm_graph",
    "powerlaw_graph",
    "get_dataset",
    "DATASETS",
]
