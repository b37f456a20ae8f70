from come_tpu.losses.sgns import sgns_loss_and_grads, sgns_sgd_step
from come_tpu.losses.community import community_loss, community_grad, community_sgd_step
from come_tpu.losses.gmm import gmm_em_fit, fit_communities

__all__ = [
    "sgns_loss_and_grads",
    "sgns_sgd_step",
    "community_loss",
    "community_grad",
    "community_sgd_step",
    "gmm_em_fit",
    "fit_communities",
]
