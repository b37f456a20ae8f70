"""Alternating ComE trainer: pretrain -> [GMM fit -> O1 -> O2 -> O3 -> eval].

TPU-native re-design of the reference driver loop (reference ``main.py`` [R],
SURVEY.md C9, §3.1) and of both hogwild learner scaffolds (``ADSCModel/
context_embeddings.py::Context2Vec.train``, ``ADSCModel/node_embeddings.py::
Node2Vec.train`` [R], SURVEY.md C6-C7):

* the producer-thread + Queue + worker-threads + Cython-nogil machinery
  becomes ONE jitted ``lax.scan`` per epoch — walk generation, window-pair
  extraction, negative sampling, SDDMM scoring, and scatter-add updates all
  fused on device with zero host round-trips;
* hogwild's racy writes become deterministic synchronous minibatch updates
  (same expected gradient; SURVEY.md §7 hard part 1);
* the linear LR decay ``alpha = max(min_alpha, lr*(1 - words/total))``
  (gensim lineage, SURVEY.md §3.2) is kept exactly, driven by a device-side
  word counter shared across O1/O2 phases.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from come_tpu.config import ComEConfig
from come_tpu.graphs.csr import CSRGraph
from come_tpu.losses.community import community_loss, community_sgd_step
from come_tpu.losses.gmm import fit_communities
from come_tpu.losses.sgns import sgns_sgd_step
from come_tpu.models import ComEParams, init_params
from come_tpu.sampling import (
    build_alias_table,
    random_walks,
    sample_alias,
    skipgram_pairs,
    subsample_keep_probs,
    unigram_weights,
)


@struct.dataclass
class TrainState:
    params: ComEParams
    key: jax.Array
    words_seen: jnp.ndarray  # f32 scalar, drives the linear LR decay


def _decayed_lr(words_seen, total_words, lr0, min_lr):
    frac = 1.0 - words_seen / jnp.maximum(total_words, 1.0)
    return jnp.maximum(min_lr, lr0 * frac)


class ComETrainer:
    """Single-host trainer; the sharded variant lives in come_tpu.parallel."""

    def __init__(
        self,
        graph: CSRGraph,
        config: ComEConfig,
        key: jax.Array | None = None,
    ):
        self.graph = graph
        self.cfg = config
        self.csr = graph.to_device()
        degrees = graph.degrees
        accept, alias = build_alias_table(unigram_weights(degrees))
        self.accept = jnp.asarray(accept)
        self.alias = jnp.asarray(alias)
        keep = subsample_keep_probs(degrees, config.down_sample)
        self.keep = (
            jnp.asarray(keep) if config.down_sample > 0 else None
        )
        if (
            config.down_sample > 0
            and config.pallas != "never"
            and config.negative_mode == "shared"
        ):
            # VERDICT r4 item 6: never a SILENT 10x tier downgrade.  The
            # fused kernels' in-kernel masks don't model word2vec
            # occurrence-dropping; frequent-node subsampling therefore
            # runs on the XLA block paths (which apply the keep-prob mask
            # exactly, sampling/windows.py).  The reference default is
            # sample=0 (SURVEY.md C4), so the fast tiers cover reference
            # behavior; this warns anyone opting into `sample` > 0.
            import warnings

            warnings.warn(
                f"down_sample={config.down_sample} disables the fused "
                "O1 walk-kernel tiers (their in-kernel masks do not "
                "model occurrence dropping); O1 will run on the "
                "~10x-slower XLA paths, which apply the keep-prob mask "
                "exactly.  O2 is unaffected (the edge pass does not "
                "subsample, matching this framework's documented O2 "
                "semantics).  Use down_sample=0 (the reference default) "
                "for the fused O1 tiers.",
                stacklevel=2,
            )
        src, dst = graph.arcs()
        self.arc_src = jnp.asarray(src)
        self.arc_dst = jnp.asarray(dst)
        # Walk STARTS exclude isolated nodes.  The reference's
        # ``random_walk`` yields a length-1 walk at a degree-0 node — no
        # trainable pairs (deepwalk lineage [R], SURVEY.md C3) — whereas
        # the static-shape device walker keeps the node in place, which
        # would hand the group-synchronous kernels a STATIONARY walk:
        # ~L*W copies of the same self-pair summed into one row update
        # per group, which measurably diverges on sparse graphs (the
        # dblp stand-in blew up its 11 isolated nodes' rows to 1e3 norms
        # and NaN'd the GMM — caught by the round-5 EVAL sweep).
        # Isolated nodes can never be REACHED (no in-edges), so start
        # filtering alone restores reference semantics.
        ws = np.flatnonzero(np.asarray(degrees) > 0).astype(np.int32)
        self.walk_starts = (
            ws if ws.size else np.arange(graph.num_nodes, dtype=np.int32)
        )

        key = jax.random.key(config.seed) if key is None else key
        k_init, self.host_key = jax.random.split(key)
        params = init_params(
            graph.num_nodes, config.dim, config.num_communities, k_init
        )
        self.state = TrainState(
            params=params,
            key=jax.random.fold_in(key, 1),
            words_seen=jnp.zeros((), jnp.float32),
        )
        self.total_words = float(self._word_budget())
        self._history: list[dict] = []

        self._o1_epoch_jit = jax.jit(self._o1_epoch, donate_argnums=0)
        self._o2_epoch_jit = jax.jit(self._o2_epoch, donate_argnums=0)
        self._o3_step_jit = jax.jit(self._o3_step, donate_argnums=0)
        self._o1_walks_step_jit = jax.jit(self._o1_walks_step, donate_argnums=0)
        self._o1_from_walks_jit = jax.jit(
            self._o1_epoch_from_walks, donate_argnums=0
        )
        self._gen_walks_jit = jax.jit(self._gen_epoch_walks)
        self._host_feeder = None
        self._walk_cache = None
        self._o1_epochs_done = 0
        self.last_o1_pairs = 0.0  # exact trained-pair counters (bench
        self.last_o2_pairs = 0.0  # uses these, not estimates)
        self._sync_stats = True

    def _walk_kernel_cfg_ok(self) -> bool:
        """Config/backend gates for the walk-banded fused kernel (shared by
        the single-device, data-parallel, and row-sharded tiers): shared
        negatives, walk length <= 128, no subsample (the in-kernel mask
        doesn't model occurrence dropping), Pallas enabled for the backend."""
        cfg = self.cfg
        if cfg.pallas == "never" or cfg.negative_mode != "shared":
            return False
        if cfg.walk_length > 128 or cfg.down_sample > 0:
            return False
        if cfg.pallas != "always":
            import jax

            if jax.default_backend() != "tpu":
                return False
        return True

    def _use_walk_kernel(self) -> bool:
        """Walk-banded fused kernel eligibility for O1 (the fastest path):
        the cfg gates above, tables in VMEM, and a graph large enough that
        one walk-group's synchronous update keeps per-row collisions bounded
        (the stability envelope; tiny graphs like Karate fall back to the
        micro-batched paths)."""
        cfg = self.cfg
        if not self._walk_kernel_cfg_ok():
            return False
        if self._walk_table_dtype() is None:
            return False
        nw = 1024 // 128  # slots per group / padded walk length
        pairs_per_group = nw * cfg.walk_length * (cfg.window + 1) / 2
        collisions_per_row = 2.0 * pairs_per_group / max(self.graph.num_nodes, 1)
        return collisions_per_row <= 16.0

    def _use_banded(self) -> bool:
        """Banded-XLA tier eligibility (the large-V path): the walk-banded
        MXU formulation with HBM-resident tables — same block-synchronous
        semantics as the fused kernel, no VMEM residency ceiling.  Checked
        only when the fused walk kernel is ineligible; the collision
        envelope uses the banded block as the synchronous unit."""
        cfg = self.cfg
        if cfg.banded == "never" or cfg.negative_mode != "shared":
            return False
        if cfg.down_sample > 0:
            return False
        if cfg.banded == "always":
            return True
        import jax

        if jax.default_backend() != "tpu":
            return False
        bc = min(cfg.banded_walk_block, cfg.batch_walks)
        pairs_per_block = bc * cfg.walk_length * (cfg.window + 1) / 2
        collisions = 2.0 * pairs_per_block / max(self.graph.num_nodes, 1)
        return collisions <= 16.0

    def _walk_table_dtype(self):
        """VMEM tier for the walk-banded kernel's resident tables.

        The kernel keeps table INPUTS in HBM and DMAs them into the VMEM
        working buffers at grid step 0, so VMEM demand is 2*table +
        ~10MB scratch/temporaries against the 110MB scoped limit:
          f32:  table <= 48MB  (V <= ~98k @ d=128 — admits Flickr)
          bf16: packed u32 table <= 48MB at 2B/elem (V <= ~196k) with
                stochastic-rounding SGD writes.
        Beyond that: None (XLA block path; a group-paged HBM-resident
        kernel is the round-2 item)."""
        import jax.numpy as jnp

        cfg = self.cfg
        # _vmem_budget is overridable so tests can force the bf16 tier at
        # CPU-testable table sizes
        budget = getattr(self, "_vmem_budget", 48 * 1024 * 1024)
        elems = self.graph.num_nodes * cfg.dim
        if elems * 4 <= budget:
            return jnp.float32
        if cfg.walk_kernel_bf16_tables and elems * 2 <= budget:
            return jnp.bfloat16
        return None

    def _use_pallas(self, tie_tables: bool) -> bool:
        """Fused-kernel eligibility: shared negatives, untied tables, and
        both tables fitting comfortably in VMEM (~6 MB each of 16 MB)."""
        cfg = self.cfg
        if cfg.pallas == "never":
            return False
        if cfg.negative_mode != "shared":
            return False
        # v5e VMEM is 128MB.  Mosaic stages whole-array VMEM operands as
        # separate in/out buffers even when aliased, so each table costs
        # 2x its size: 4*table + ~4MB scratch <= 128MB -> 28MB/table
        # (V <= ~57k @ d=128; measured OOM at Flickr's 41MB/table: XLA
        # reported 164.8M = 4x41.2M demand).  Larger graphs take the XLA
        # block path; an HBM-resident-table kernel is the round-2 fix.
        table_bytes = self.graph.num_nodes * cfg.dim * 4
        fits = table_bytes <= 28 * 1024 * 1024
        if cfg.pallas == "always":
            return True
        import jax

        return fits and jax.default_backend() == "tpu"

    # ---------------------------------------------------------------- budget

    def _word_budget(self) -> float:
        """Total center-word count for the global linear LR decay."""
        cfg = self.cfg
        v, e = len(self.walk_starts), self.graph.num_arcs
        o1_epochs = cfg.pretrain_epochs + cfg.outer_iters * cfg.o1_epochs_per_iter
        o2_epochs = cfg.outer_iters * cfg.o2_epochs_per_iter
        return (
            o1_epochs * v * cfg.walks_per_node * cfg.walk_length
            + o2_epochs * e
        )

    # ------------------------------------------------------------- O1 (walks)

    def _sgns_microbatched(
        self, node_emb, ctx_emb, c, x, negs, m, lr, key, tie_tables,
        compact=False,
    ):
        """Apply one macro-batch of pairs as sequential micro-step updates.

        Pairs are generated in large device batches (walks/negatives are
        cheap and TPU-efficient at scale) but *applied* in chunks of
        ``cfg.batch_pairs``: hogwild's sequential per-pair application is
        what keeps word2vec stable, and micro-stepping restores that
        feedback at chunk granularity while duplicate rows within a chunk
        still sum exactly like consecutive hogwild updates.
        """
        cfg = self.cfg
        P = c.size
        K = cfg.negative
        c = c.reshape(P)
        x = x.reshape(P)
        m = m.reshape(P)
        if negs is not None:
            negs = negs.reshape(P, K)

        if compact and cfg.compact_budget and cfg.compact_budget < 1.0:
            # stable partition: valid pairs first, then truncate to the
            # budget — halves SGD slots per trained pair (mask rate ~0.52)
            order = jnp.argsort(~m.astype(bool), stable=True)
            budget = int(P * cfg.compact_budget)
            order = order[:budget]
            c, x, m = c[order], x[order], m[order]
            if negs is not None:
                negs = negs[order]
            P = budget

        mb = min(cfg.batch_pairs, P)
        n_micro = math.ceil(P / mb)
        pad = n_micro * mb - P

        c2 = jnp.pad(c, (0, pad)).reshape(n_micro, mb)
        x2 = jnp.pad(x, (0, pad)).reshape(n_micro, mb)
        m2 = jnp.pad(
            m.astype(jnp.float32), (0, pad)
        ).reshape(n_micro, mb)

        if cfg.negative_mode == "shared":
            from come_tpu.losses.sgns_block import sgns_block_sgd_step

            keys = jax.random.split(key, n_micro)
            nw = cfg.negative / cfg.shared_negatives
            use_pallas = self._use_pallas(tie_tables)

            def micro(carry, xs):
                emb_in, emb_out = carry
                mc, mx, mm, k = xs
                sneg = sample_alias(
                    self.accept, self.alias, k, (cfg.shared_negatives,)
                )
                if use_pallas:
                    from come_tpu.ops.pallas_sgns import (
                        fused_sgns_step,
                        fused_sgns_step_tied,
                    )

                    interp = (cfg.pallas == "always"
                              and jax.default_backend() != "tpu")
                    if tie_tables:
                        emb_in, loss = fused_sgns_step_tied(
                            emb_in, mc, mx, sneg, mm, lr, nw,
                            tile_pairs=cfg.pallas_tile_pairs,
                            interpret=interp,
                        )
                        emb_out = emb_in
                    else:
                        emb_in, emb_out, loss = fused_sgns_step(
                            emb_in, emb_out, mc, mx, sneg, mm, lr, nw,
                            tile_pairs=cfg.pallas_tile_pairs,
                            interpret=interp,
                        )
                    npairs = jnp.sum(mm)
                else:
                    emb_in, emb_out, loss, npairs = sgns_block_sgd_step(
                        emb_in, emb_out, mc, mx, sneg, mm, lr, nw,
                        tie_tables=tie_tables,
                    )
                return (emb_in, emb_out), (loss, npairs)

            (node_emb, ctx_emb), (losses, npairs) = jax.lax.scan(
                micro, (node_emb, ctx_emb), (c2, x2, m2, keys)
            )
            return node_emb, ctx_emb, jnp.sum(losses), jnp.sum(npairs)

        n2 = jnp.pad(
            negs.reshape(P, K), ((0, pad), (0, 0))
        ).reshape(n_micro, mb, K)

        def micro(carry, xs):
            emb_in, emb_out = carry
            mc, mx, mn, mm = xs
            emb_in, emb_out, loss, npairs = sgns_sgd_step(
                emb_in,
                emb_out,
                mc,
                mx,
                mn,
                mm,
                lr,
                tie_tables=tie_tables,
                max_exp=cfg.max_exp,
            )
            return (emb_in, emb_out), (loss, npairs)

        (node_emb, ctx_emb), (losses, npairs) = jax.lax.scan(
            micro, (node_emb, ctx_emb), (c2, x2, n2, m2)
        )
        return node_emb, ctx_emb, jnp.sum(losses), jnp.sum(npairs)

    def _use_walk_kernel_gen(self) -> bool:
        """In-kernel walk generation (walk_gen='kernel'): fused kernel
        eligible AND the padded CSR fits the kernel's VMEM side budget."""
        if self.cfg.walk_gen != "kernel":
            return False
        if not self._use_walk_kernel():
            return False
        if self.cfg.restart_prob != 0.0:
            return False  # gen kernel draws uniform neighbors only; the
            # scan walker handles restart (reference alpha) semantics
        # neighbor lists ride VMEM; offsets+degrees ride SMEM (scalar
        # loads) — both must fit their side budgets
        if self.graph.num_arcs * 4 > 12 * 1024 * 1024:
            return False
        return 2 * (self.graph.num_nodes + 1) * 4 <= 256 * 1024

    def _o1_epoch_gen(self, state: TrainState, start_perm: jnp.ndarray):
        """O1 epoch with IN-KERNEL walk generation: no walker scan at all —
        each macro step hands the kernel its start nodes, a threefry bit
        matrix, and the VMEM-resident CSR (ops/pallas_walk_sgns.py gen
        mode; VERDICT r2 item 5)."""
        from come_tpu.ops.pallas_walk_sgns import (
            NWL,
            fused_walk_sgns_gen_step,
        )

        cfg = self.cfg
        S, B = start_perm.shape
        NW = NWL // 128
        G = -(-B // NW)
        n_pools = -(-G // cfg.walk_pool_refresh)
        negw = cfg.negative / cfg.shared_negatives
        interp = cfg.pallas == "always" and jax.default_backend() != "tpu"
        wdt = self._walk_table_dtype()
        if wdt == jnp.bfloat16:
            p = state.params
            state = state.replace(params=p.replace(
                node_emb=p.node_emb.astype(wdt),
                ctx_emb=p.ctx_emb.astype(wdt),
            ))

        def body(carry, starts):
            params, key, words = carry
            key, kb, kp, kn = jax.random.split(key, 4)
            lr = _decayed_lr(words, self.total_words, cfg.lr, cfg.min_lr)
            bits = jax.random.bits(kb, (G, NWL), jnp.uint32)
            sneg = sample_alias(
                self.accept, self.alias, kn,
                (n_pools, cfg.shared_negatives),
            )
            seed = jax.random.randint(kp, (), 0, 2**31 - 1, dtype=jnp.int32)
            ne, ce, loss, npairs = fused_walk_sgns_gen_step(
                params.node_emb, params.ctx_emb, starts, bits,
                self._csr_indptr1d, self._csr_deg1d,
                self._csr_indices2d, sneg,
                lr, negw, seed, walk_length=cfg.walk_length,
                window=cfg.window, interpret=interp,
                reduced_window=not interp,
                mxu_bf16=cfg.walk_kernel_bf16,
                pool_refresh=cfg.walk_pool_refresh,
            )
            params = params.replace(node_emb=ne, ctx_emb=ce)
            words = words + jnp.float32(B * cfg.walk_length)
            return (params, key, words), (loss, npairs)

        (params, key, words), (losses, npairs) = jax.lax.scan(
            body, (state.params, state.key, state.words_seen), start_perm
        )
        if wdt == jnp.bfloat16:
            params = params.replace(
                node_emb=params.node_emb.astype(jnp.float32),
                ctx_emb=params.ctx_emb.astype(jnp.float32),
            )
        state = TrainState(params=params, key=key, words_seen=words)
        npair = jnp.sum(npairs)
        loss = jnp.sum(losses) / jnp.maximum(npair, 1.0)
        return state, jnp.stack([loss, npair])

    # walker chunk width: one epoch-wide call is fastest for small
    # corpora (the walker is per-step-latency bound, so one S*B-wide
    # scan costs ~one B-wide scan), but its per-unrolled-step [1, S*B]
    # remat copies carry a 128x tile-padding expansion that reaches
    # GBs at multi-million-walk epochs — measured 24.4G HBM demand and
    # a compile OOM at 5M walks / V=500k (synthetic-10m, round-5 EVAL
    # sweep).  Chunking bounds the temporaries; walks themselves are
    # param-independent so the split is semantics-free.
    _WALK_GEN_CHUNK = 262144

    def _gen_epoch_walks(self, key, start_perm: jnp.ndarray) -> jnp.ndarray:
        """Generate the WHOLE epoch's walks, hoisted out of the SGD scan,
        in bounded-width walker calls (see _WALK_GEN_CHUNK)."""
        S, B = start_perm.shape
        L = self.cfg.walk_length
        C = self._WALK_GEN_CHUNK
        if S * B <= C:
            return random_walks(
                self.csr, start_perm.reshape(S * B), L, key,
                restart_prob=self.cfg.restart_prob,
            ).reshape(S, B, L)
        n = -(-(S * B) // C)
        flat = jnp.resize(start_perm.reshape(S * B), (n, C))
        keys = jax.random.split(key, n)

        def one(xs):
            k, starts = xs
            return random_walks(
                self.csr, starts, L, k,
                restart_prob=self.cfg.restart_prob,
            )

        walks = jax.lax.map(one, (keys, flat))  # [n, C, L]
        return walks.reshape(n * C, L)[: S * B].reshape(S, B, L)

    # corpus elements (S*B*L) beyond which the epoch STREAMS walk
    # generation inside the SGD scan instead of materializing the whole
    # corpus: a 1.6GB epoch corpus (synthetic-10m at walks_per_node=10)
    # reproducibly crashed the TPU worker runtime, while the identical
    # math with per-step generation ran stably for 2500+ macro steps
    # (round-5 probes).  Streaming also drops the corpus HBM entirely.
    _WALK_STREAM_ELEMS = 1 << 27  # ~512MB of i32

    def _o1_epoch(self, state: TrainState, start_perm: jnp.ndarray):
        """start_perm int32 [S, B]: per-step walk origins."""
        S, B = start_perm.shape
        if S * B * self.cfg.walk_length > self._WALK_STREAM_ELEMS:
            return self._o1_epoch_from_walks(
                state, start_perm, gen_from_starts=True
            )
        key, kw_all = jax.random.split(state.key)
        state = state.replace(key=key)
        walks_all = self._gen_epoch_walks(kw_all, start_perm)
        return self._o1_epoch_from_walks(state, walks_all)

    def _o1_epoch_from_walks(
        self,
        state: TrainState,
        walks_all: jnp.ndarray,
        gen_from_starts: bool = False,
    ):
        """walks_all int32 [S, B, L]: the epoch's corpus (fresh or
        cached) — or, with ``gen_from_starts``, int32 [S, B] per-step
        walk ORIGINS, each step generating its own walks inside the scan
        (the large-corpus streaming mode; see _WALK_STREAM_ELEMS)."""
        cfg = self.cfg
        B = walks_all.shape[1]

        use_walk_kernel = self._use_walk_kernel()
        use_banded = (not use_walk_kernel) and self._use_banded()
        wdt = self._walk_table_dtype() if use_walk_kernel else None
        if wdt == jnp.bfloat16:
            # bf16-resident tables for the epoch (SR writes in-kernel);
            # master copy restored to f32 at the epoch boundary
            p = state.params
            state = state.replace(params=p.replace(
                node_emb=p.node_emb.astype(wdt),
                ctx_emb=p.ctx_emb.astype(wdt),
            ))
        if use_banded:
            # pack [V, d] x2 -> [V, 2d] for the epoch: the banded tier is
            # gather/scatter ROW-RATE bound, and phi/ctx share indices —
            # one packed row op moves both tables (see sgns_banded.py)
            from come_tpu.losses.sgns_banded import pack_tables

            p = state.params
            state = state.replace(params=p.replace(
                node_emb=pack_tables(p.node_emb, p.ctx_emb),
                ctx_emb=jnp.zeros((0, 0), p.ctx_emb.dtype),
            ))

        def body(carry, walks):
            params, key, words = carry
            key, kw, kp, kn = jax.random.split(key, 4)
            lr = _decayed_lr(words, self.total_words, cfg.lr, cfg.min_lr)
            if gen_from_starts:  # streaming mode: xs rows are origins
                walks = random_walks(
                    self.csr, walks, cfg.walk_length, kw,
                    restart_prob=cfg.restart_prob,
                )
            if use_walk_kernel:
                from come_tpu.ops.pallas_walk_sgns import (
                    NWL,
                    fused_walk_sgns_step,
                )

                interp = (cfg.pallas == "always"
                          and jax.default_backend() != "tpu")
                n_groups = -(-B // (NWL // 128))
                n_pools = -(-n_groups // cfg.walk_pool_refresh)
                sneg = sample_alias(
                    self.accept, self.alias, kn,
                    (n_pools, cfg.shared_negatives),
                )
                seed = jax.random.randint(
                    kp, (), 0, 2**31 - 1, dtype=jnp.int32
                )
                ne, ce, loss, npairs = fused_walk_sgns_step(
                    params.node_emb,
                    params.ctx_emb,
                    walks,
                    sneg,
                    lr,
                    cfg.negative / cfg.shared_negatives,
                    seed,
                    window=cfg.window,
                    interpret=interp,
                    # interpreter has no kernel-PRNG lowering: CPU test
                    # path trains the full window instead
                    reduced_window=not interp,
                    mxu_bf16=cfg.walk_kernel_bf16,
                    pool_refresh=cfg.walk_pool_refresh,
                )
            elif use_banded:
                from come_tpu.losses.sgns_banded import (
                    banded_walk_sgns_step_packed,
                )

                kpool, kwin = jax.random.split(kn)
                # full-size blocks (the fast positive-pass shape) with C
                # fresh pool sub-chunks per block so no pool application
                # exceeds the banded_pool_slots stability budget
                bc = min(cfg.banded_walk_block, B)
                wpp = max(1, cfg.banded_pool_slots // cfg.walk_length)
                C = -(-bc // wpp)
                while bc % C:  # smallest divisor of bc >= the budget
                    C += 1
                n_blocks = -(-B // bc)
                sneg = sample_alias(
                    self.accept, self.alias, kpool,
                    (n_blocks, C, cfg.shared_negatives),
                )
                ne, loss, npairs = banded_walk_sgns_step_packed(
                    params.node_emb, walks, sneg, lr,
                    cfg.negative / cfg.shared_negatives, kwin,
                    window=cfg.window,
                    walk_block=bc,
                    mxu_bf16=cfg.walk_kernel_bf16,
                    sorted_scatter=cfg.banded_sorted_scatter,
                )
                ce = params.ctx_emb  # zero-size placeholder while packed
            else:
                c, x, m = skipgram_pairs(walks, cfg.window, kp, self.keep)
                negs = None
                if cfg.negative_mode != "shared":
                    negs = sample_alias(
                        self.accept, self.alias, kn,
                        c.shape + (cfg.negative,),
                    )
                ne, ce, loss, npairs = self._sgns_microbatched(
                    params.node_emb, params.ctx_emb, c, x, negs, m, lr, kn,
                    tie_tables=False, compact=True,
                )
            params = params.replace(node_emb=ne, ctx_emb=ce)
            words = words + jnp.float32(B * cfg.walk_length)
            return (params, key, words), (loss, npairs)

        (params, key, words), (losses, npairs) = jax.lax.scan(
            body, (state.params, state.key, state.words_seen), walks_all
        )
        if wdt == jnp.bfloat16:
            params = params.replace(
                node_emb=params.node_emb.astype(jnp.float32),
                ctx_emb=params.ctx_emb.astype(jnp.float32),
            )
        if use_banded:
            from come_tpu.losses.sgns_banded import unpack_tables

            ne, ce = unpack_tables(params.node_emb)
            params = params.replace(node_emb=ne, ctx_emb=ce)
        state = TrainState(params=params, key=key, words_seen=words)
        npair = jnp.sum(npairs)
        loss = jnp.sum(losses) / jnp.maximum(npair, 1.0)
        # ONE stacked stats vector -> ONE host transfer per epoch (the
        # device may sit behind a high-latency tunnel; each D2H sync is
        # ~a full round trip)
        return state, jnp.stack([loss, npair])

    # scan steps per device call: this rig's tunneled TPU runtime kills
    # programs running longer than ~30-40s ("TPU worker crashed or
    # restarted" — reproduced at synthetic-10m, where one 4883-step
    # epoch scan runs ~50s, while the same math in shorter calls runs
    # stably for minutes).  1024 macro steps ~= 8-10s at that scale;
    # chaining calls costs ~0.2ms dispatch each and the LR/words carry
    # lives in TrainState, so the split is semantics-free.
    _MAX_STEPS_PER_CALL = 1024

    def _call_chunked(self, jit_fn, arr, S: int):
        """Run an epoch jit in bounded-step slices, merging the stats
        vector pair-weighted (device-side; no extra host syncs)."""
        cap = self._MAX_STEPS_PER_CALL
        if S <= cap:
            self.state, stats = jit_fn(self.state, arr)
            return stats
        tot_l = jnp.float32(0.0)
        tot_p = jnp.float32(0.0)
        for i in range(0, S, cap):
            self.state, st = jit_fn(self.state, arr[i : i + cap])
            tot_l = tot_l + st[0] * st[1]
            tot_p = tot_p + st[1]
        return jnp.stack([tot_l / jnp.maximum(tot_p, 1.0), tot_p])

    def o1_epoch(self) -> float:
        """One pass of `walks_per_node` walks from every node (SURVEY §3.2)."""
        cfg = self.cfg
        if cfg.corpus == "host":
            return self._o1_epoch_host()
        n_starts = len(self.walk_starts) * cfg.walks_per_node
        B = min(cfg.batch_walks, n_starts)
        S = math.ceil(n_starts / B)
        self.host_key, k = jax.random.split(self.host_key)
        perm = jax.random.permutation(
            k,
            jnp.tile(
                jnp.asarray(self.walk_starts), cfg.walks_per_node
            ),
        )
        perm = jnp.resize(perm, (S, B))  # wraps the tail batch
        if self._use_walk_kernel_gen() and cfg.walk_regen_epochs == 1:
            if not hasattr(self, "_csr_indptr1d"):
                from come_tpu.ops.pallas_walk_sgns import pack_csr_gen

                ip1, dg1, ix2 = pack_csr_gen(
                    self.graph.indptr, self.graph.indices
                )
                self._csr_indptr1d = jnp.asarray(ip1)
                self._csr_deg1d = jnp.asarray(dg1)
                self._csr_indices2d = jnp.asarray(ix2)
                self._o1_gen_jit = jax.jit(
                    self._o1_epoch_gen, donate_argnums=0
                )
            self._o1_epochs_done += 1
            stats = self._call_chunked(self._o1_gen_jit, perm, S)
            return self._finish_o1(stats)
        if cfg.walk_regen_epochs != 1:
            # cached corpus (reference semantics: deepwalk writes walk
            # files once and every epoch re-streams them, SURVEY.md C3)
            regen = self._walk_cache is None or (
                cfg.walk_regen_epochs > 0
                and self._o1_epochs_done % cfg.walk_regen_epochs == 0
            )
            if regen:
                self.host_key, kw = jax.random.split(self.host_key)
                self._walk_cache = self._gen_walks_jit(kw, perm)
            self._o1_epochs_done += 1
            stats = self._call_chunked(
                self._o1_from_walks_jit, self._walk_cache, S
            )
            return self._finish_o1(stats)
        self._o1_epochs_done += 1
        stats = self._call_chunked(self._o1_epoch_jit, perm, S)
        return self._finish_o1(stats)

    def _finish_o1(self, stats):
        self._o1_stats = stats
        if not self._sync_stats:
            return None
        return self.o1_sync()

    def o1_sync(self) -> float:
        """Flush the pending O1 stats to host (one device round trip);
        sets ``last_o1_pairs`` and returns the loss/pair.  With
        ``stats_sync(False)``, epochs return None and callers flush once
        after a run of epochs — the pattern for high-latency device links
        (bench.py times chained epochs with a single sync)."""
        st = np.asarray(self._o1_stats)
        self.last_o1_pairs = float(st[1])
        return float(st[0])

    def stats_sync(self, sync: bool) -> None:
        """Toggle per-epoch host syncing of the stats vector."""
        self._sync_stats = sync

    def _o1_epoch_host(self) -> float:
        """Host-corpus O1 epoch: C++ feeder generates walks on host threads
        while the device trains the previous batch (reference C3's
        pool-plus-files pipeline, minus the disk).

        With the walk-banded kernel eligible, each host batch goes through
        the fused kernel (``_o1_walks_step`` routes it), so walk
        generation and SGD genuinely OVERLAP: the feeder's threads produce
        batch k+1 while the chip trains batch k — the fresh-walks answer
        to the device walker's serialized-gather cost (docs/PERF.md).
        Losses stay on device until the epoch ends (one host sync)."""
        from come_tpu.native import HostWalkFeeder

        cfg = self.cfg
        v = len(self.walk_starts)  # no walks from isolated nodes
        B = min(cfg.batch_walks, v)
        n_batches = math.ceil(v * cfg.walks_per_node / B)
        if self._host_feeder is None:
            self._host_feeder = HostWalkFeeder(
                self.graph, batch=B, length=cfg.walk_length, seed=cfg.seed,
                restart_prob=cfg.restart_prob, nodes=self.walk_starts,
            )
        stats = []
        for _ in range(n_batches):
            walks = jnp.asarray(next(self._host_feeder))
            self.state, loss, npairs = self._o1_walks_step_jit(
                self.state, walks
            )
            stats.append((loss, npairs))  # device values: no per-batch sync
        total_loss = float(sum(s[0] for s in stats))
        total_pairs = float(sum(s[1] for s in stats))
        self.last_o1_pairs = total_pairs
        return total_loss / max(total_pairs, 1.0)

    def _o1_walks_step(self, state: TrainState, walks: jnp.ndarray):
        """One O1 macro step from externally provided walks [B, L]."""
        cfg = self.cfg
        key, kp, kn = jax.random.split(state.key, 3)
        lr = _decayed_lr(
            state.words_seen, self.total_words, cfg.lr, cfg.min_lr
        )
        if self._use_walk_kernel():
            from come_tpu.ops.pallas_walk_sgns import (
                NWL,
                fused_walk_sgns_step,
            )

            interp = (cfg.pallas == "always"
                      and jax.default_backend() != "tpu")
            n_groups = -(-walks.shape[0] // (NWL // 128))
            n_pools = -(-n_groups // cfg.walk_pool_refresh)
            sneg = sample_alias(
                self.accept, self.alias, kn,
                (n_pools, cfg.shared_negatives),
            )
            seed = jax.random.randint(kp, (), 0, 2**31 - 1, dtype=jnp.int32)
            wdt = self._walk_table_dtype()
            ne0 = state.params.node_emb.astype(wdt)
            ce0 = state.params.ctx_emb.astype(wdt)
            ne, ce, loss, npairs = fused_walk_sgns_step(
                ne0, ce0, walks, sneg, lr,
                cfg.negative / cfg.shared_negatives, seed,
                window=cfg.window, interpret=interp,
                reduced_window=not interp,
                mxu_bf16=cfg.walk_kernel_bf16,
                pool_refresh=cfg.walk_pool_refresh,
            )
            params = state.params.replace(
                node_emb=ne.astype(jnp.float32),
                ctx_emb=ce.astype(jnp.float32),
            )
        else:
            c, x, m = skipgram_pairs(walks, cfg.window, kp, self.keep)
            negs = None
            if cfg.negative_mode != "shared":
                negs = sample_alias(
                    self.accept, self.alias, kn, c.shape + (cfg.negative,)
                )
            ne, ce, loss, npairs = self._sgns_microbatched(
                state.params.node_emb, state.params.ctx_emb, c, x, negs, m,
                lr, kn, tie_tables=False, compact=True,
            )
            params = state.params.replace(node_emb=ne, ctx_emb=ce)
        words = state.words_seen + jnp.float32(
            walks.shape[0] * cfg.walk_length
        )
        return TrainState(params=params, key=key, words_seen=words), loss, npairs

    # ------------------------------------------------------------- O2 (edges)

    def _use_walk_kernel_o2(self) -> bool:
        """Paired (edge) mode of the walk-banded kernel for O2: shared
        negatives, f32 tables in VMEM (no PRNG in paired mode, so no
        stochastic rounding — the bf16-table tier stays on the XLA path),
        and a graph large enough for the 512-edges-per-group synchronous
        update (collision envelope as in :meth:`_use_walk_kernel`)."""
        cfg = self.cfg
        if cfg.o2_mode not in ("auto", "paired"):
            return False
        if cfg.pallas == "never" or cfg.negative_mode != "shared":
            return False
        if cfg.pallas != "always" and jax.default_backend() != "tpu":
            return False
        budget = getattr(self, "_vmem_budget", 48 * 1024 * 1024)
        if self.graph.num_nodes * cfg.dim * 4 > budget:
            return False  # f32 VMEM tier only
        from come_tpu.ops.pallas_walk_sgns import NWL

        collisions = 2.0 * NWL / max(self.graph.num_nodes, 1)
        return collisions <= 16.0

    def _use_star_o2(self) -> bool:
        """Star (fan-out grouped) fused O2 tier: shared negatives, f32
        tied table in VMEM.  Tied staging keeps ONE table resident, so the
        VMEM ceiling is 2x the paired tier's; the collision envelope is
        the paired tier's (group-synchronous updates over <= 2*NWL pair
        endpoints)."""
        cfg = self.cfg
        if cfg.o2_mode not in ("auto", "star"):
            return False
        if cfg.pallas == "never" or cfg.negative_mode != "shared":
            return False
        if cfg.pallas != "always" and jax.default_backend() != "tpu":
            return False
        budget = getattr(self, "_vmem_budget", 48 * 1024 * 1024)
        if self.graph.num_nodes * cfg.dim * 4 > 2 * budget:
            return False  # single f32 table resident
        from come_tpu.ops.pallas_star_sgns import NWL

        collisions = 2.0 * NWL / max(self.graph.num_nodes, 1)
        return collisions <= 16.0

    def _star_layout(self):
        """Build (once) the star slot/meta stream and its row view.  The
        layout is static — the edge list doesn't change — and epochs
        shuffle at ROW granularity, which is exactly the granularity that
        matters under group-synchronous updates (intra-group order is
        irrelevant by construction)."""
        if not hasattr(self, "_star_rows_slots"):
            from come_tpu.sampling.stars import (
                build_star_layout,
                star_layout_stats,
            )

            u, v = self.graph.edges_undirected()
            slots, meta = build_star_layout(u, v, self.graph.num_nodes)
            st = star_layout_stats(slots, meta)
            self._star_pairs = st["pairs"]
            self._star_rows_slots = jnp.asarray(
                slots.reshape(-1, 128), jnp.int32
            )
            self._star_rows_meta = jnp.asarray(
                meta.reshape(-1, 128), jnp.int32
            )
        return self._star_rows_slots, self._star_rows_meta

    def _o2_epoch_starlike(
        self,
        state: TrainState,
        rows_slots: jnp.ndarray,  # [NR, 128] star layout rows
        rows_meta: jnp.ndarray,  # [NR, 128]
        pairs_per_step: float,
        steps: int,
        rows_per_step: int,
        banded: bool,
    ):
        """Star-layout O2 epoch: permute layout rows on device, scan
        macro steps through the fused tied kernel (``banded=False``) or
        the HBM-table XLA star step (``banded=True``).  Shared scaffold —
        pads with self-masking rows (meta -2): exact zero work, unlike
        the paired tier's wrap-resize which retrains a few edges."""
        from come_tpu.losses.star_banded import star_banded_sgns_step
        from come_tpu.ops.pallas_star_sgns import NWL, fused_star_sgns_step

        cfg = self.cfg
        key, kperm = jax.random.split(state.key)
        NR = rows_slots.shape[0]
        perm = jax.random.permutation(kperm, NR)
        pad_rows = steps * rows_per_step - NR
        ps = jnp.pad(rows_slots[perm], ((0, pad_rows), (0, 0)))
        pm = jnp.pad(
            rows_meta[perm], ((0, pad_rows), (0, 0)), constant_values=-2
        )
        slots_all = ps.reshape(steps, rows_per_step, 128)
        meta_all = pm.reshape(steps, rows_per_step, 128)
        negw = cfg.negative / cfg.shared_negatives

        def body(carry, sm):
            params, key, words = carry
            slots_s, meta_s = sm
            key, kn, kp = jax.random.split(key, 3)
            lr = _decayed_lr(words, self.total_words, cfg.lr, cfg.min_lr)
            if banded:
                sneg = sample_alias(
                    self.accept, self.alias, kn, (cfg.shared_negatives,)
                )
                ne, loss, npairs = star_banded_sgns_step(
                    params.node_emb, slots_s, meta_s, sneg,
                    lr * cfg.alpha, negw,
                    mxu_bf16=cfg.walk_kernel_bf16,
                    sorted_scatter=cfg.banded_sorted_scatter,
                )
            else:
                interp = (cfg.pallas == "always"
                          and jax.default_backend() != "tpu")
                n_groups = -(-(rows_per_step * 128) // NWL)
                n_pools = -(-n_groups // cfg.walk_pool_refresh)
                sneg = sample_alias(
                    self.accept, self.alias, kn,
                    (n_pools, cfg.shared_negatives),
                )
                seed = jax.random.randint(
                    kp, (), 0, 2**31 - 1, dtype=jnp.int32
                )
                ne, loss, npairs = fused_star_sgns_step(
                    params.node_emb, slots_s.reshape(-1),
                    meta_s.reshape(-1), sneg, lr * cfg.alpha, negw, seed,
                    mxu_bf16=cfg.walk_kernel_bf16,
                    pool_refresh=cfg.walk_pool_refresh, interpret=interp,
                )
            params = params.replace(node_emb=ne)
            words = words + jnp.float32(pairs_per_step)
            return (params, key, words), (loss, npairs)

        (params, key, words), (losses, npairs) = jax.lax.scan(
            body, (state.params, key, state.words_seen),
            (slots_all, meta_all),
        )
        state = TrainState(params=params, key=key, words_seen=words)
        npair = jnp.sum(npairs)
        loss = jnp.sum(losses) / jnp.maximum(npair, 1.0)
        return state, jnp.stack([loss, npair])

    def _use_banded_star_o2(self) -> bool:
        """Star fan-out O2 at XLA level with the tied table in HBM
        (losses/star_banded.py) — the large-V edge-pass tier for graphs
        past the fused star kernel's VMEM ceiling, mirroring the O1
        banded tier's role.  Checked only when the fused star tier is
        ineligible."""
        cfg = self.cfg
        if cfg.o2_mode not in ("auto", "star"):
            return False
        if cfg.banded == "never" or cfg.negative_mode != "shared":
            return False
        if cfg.banded != "always" and jax.default_backend() != "tpu":
            return False
        # block-synchronous collision envelope (banded-O1 convention;
        # block = 512 layout rows x 128 slots)
        collisions = 2.0 * 512 * 128 / max(self.graph.num_nodes, 1)
        return cfg.banded == "always" or collisions <= 16.0

    def _o2_epoch_kernel(self, state: TrainState, rows_all: jnp.ndarray):
        """Kernel O2 epoch: rows_all int32 [S, B_r, 128], each row 64
        edges interleaved [u0, v0, u1, v1, ...].  The kernel runs with
        emb_in = emb_out = node_emb (separate working copies); the tied
        update composes as new_in + new_out - old — the same
        sum-of-contributions as the per-pair tied oracle, with the
        kernel's group-sequential staleness inside a macro step
        (hogwild-class; quality asserted end-to-end)."""
        from come_tpu.ops.pallas_walk_sgns import NWL, fused_walk_sgns_step

        cfg = self.cfg
        S, B_r, Lp = rows_all.shape
        arcs_per_step = B_r * Lp  # 2 trained pairs per edge = slot count

        def body(carry, rows):
            params, key, words = carry
            key, kn, kp = jax.random.split(key, 3)
            lr = _decayed_lr(words, self.total_words, cfg.lr, cfg.min_lr)
            interp = (cfg.pallas == "always"
                      and jax.default_backend() != "tpu")
            n_groups = -(-B_r // (NWL // Lp))
            n_pools = -(-n_groups // cfg.walk_pool_refresh)
            sneg = sample_alias(
                self.accept, self.alias, kn,
                (n_pools, cfg.shared_negatives),
            )
            # PRNG unused today in paired mode (no reduced window, f32
            # tables) but the seed is threaded so SR/bf16 support can't
            # silently share one stream across macro steps
            seed = jax.random.randint(kp, (), 0, 2**31 - 1, dtype=jnp.int32)
            ne0 = params.node_emb
            new_in, new_out, loss, npairs = fused_walk_sgns_step(
                ne0, ne0, rows, sneg, lr * cfg.alpha,
                cfg.negative / cfg.shared_negatives, seed,
                window=1, interpret=interp, reduced_window=False,
                mxu_bf16=cfg.walk_kernel_bf16,
                pool_refresh=cfg.walk_pool_refresh, paired=True,
            )
            ne = new_in + new_out - ne0
            params = params.replace(node_emb=ne)
            words = words + jnp.float32(arcs_per_step)
            return (params, key, words), (loss, npairs)

        (params, key, words), (losses, npairs) = jax.lax.scan(
            body, (state.params, state.key, state.words_seen), rows_all
        )
        state = TrainState(params=params, key=key, words_seen=words)
        npair = jnp.sum(npairs)
        loss = jnp.sum(losses) / jnp.maximum(npair, 1.0)
        return state, jnp.stack([loss, npair])

    def _o2_epoch(self, state: TrainState, src: jnp.ndarray, dst: jnp.ndarray):
        """src/dst int32 [S, B]: per-step arc batches; tied-table SGNS."""
        cfg = self.cfg

        def body(carry, arc):
            params, key, words = carry
            s, d = arc
            key, kn = jax.random.split(key)
            lr = _decayed_lr(words, self.total_words, cfg.lr, cfg.min_lr)
            negs = None
            if cfg.negative_mode != "shared":
                negs = sample_alias(
                    self.accept, self.alias, kn, s.shape + (cfg.negative,)
                )
            ne, _, loss, npairs = self._sgns_microbatched(
                params.node_emb,
                params.node_emb,
                s,
                d,
                negs,
                jnp.ones_like(s, jnp.float32),
                lr * cfg.alpha,
                kn,
                tie_tables=True,
            )
            params = params.replace(node_emb=ne)
            words = words + jnp.float32(s.shape[0])
            return (params, key, words), (loss, npairs)

        (params, key, words), (losses, npairs) = jax.lax.scan(
            body, (state.params, state.key, state.words_seen), (src, dst)
        )
        state = TrainState(params=params, key=key, words_seen=words)
        npair = jnp.sum(npairs)
        loss = jnp.sum(losses) / jnp.maximum(npair, 1.0)
        return state, jnp.stack([loss, npair])

    def o2_epoch(self) -> float:
        """One pass over all directed arcs (reference trains the edge list,
        SURVEY.md C7/§3.3).  The fast path packs undirected edges into the
        walk-banded kernel's paired mode (both arc directions per edge)."""
        cfg = self.cfg
        star = self._use_star_o2()
        if star or self._use_banded_star_o2():
            rs, rm = self._star_layout()
            if not hasattr(self, "_o2_starlike_jit"):
                self._o2_starlike_jit = jax.jit(
                    self._o2_epoch_starlike, donate_argnums=0,
                    static_argnums=(3, 4, 5, 6),
                )
            NR = rs.shape[0]
            # slots per macro step ~ batch_edges (the paired tier's slot
            # count at the same config); the fused kernel additionally
            # wants whole 8-row groups per step
            rps = max(8, min(-(-cfg.batch_edges // 128), NR))
            if star:
                rps = -(-rps // 8) * 8
            steps = -(-NR // rps)
            self.state, stats = self._o2_starlike_jit(
                self.state, rs, rm,
                float(self._star_pairs) / steps, steps, rps, not star,
            )
            return self._finish_o2(stats)
        if self._use_walk_kernel_o2():
            if not hasattr(self, "_o2_kernel_jit"):
                self._o2_kernel_jit = jax.jit(
                    self._o2_epoch_kernel, donate_argnums=0
                )
                u, v = self.graph.edges_undirected()
                self._und_u = jnp.asarray(u, jnp.int32)
                self._und_v = jnp.asarray(v, jnp.int32)
            e2 = self._und_u.shape[0]
            EPR = 64  # edges per 128-slot row
            edges_step = max(EPR, min(cfg.batch_edges // 2, e2))
            B_r = -(-edges_step // EPR)
            S = max(1, math.ceil(e2 / (B_r * EPR)))
            self.host_key, k = jax.random.split(self.host_key)
            perm = jax.random.permutation(k, e2)
            uu = jnp.resize(self._und_u[perm], (S * B_r * EPR,))
            vv = jnp.resize(self._und_v[perm], (S * B_r * EPR,))
            rows = jnp.stack([uu, vv], axis=1).reshape(S, B_r, 2 * EPR)
            self.state, stats = self._o2_kernel_jit(self.state, rows)
            return self._finish_o2(stats)
        e = self.graph.num_arcs
        B = min(cfg.batch_edges, e)
        S = math.ceil(e / B)
        self.host_key, k = jax.random.split(self.host_key)
        perm = jax.random.permutation(k, e)
        src = jnp.resize(self.arc_src[perm], (S, B))
        dst = jnp.resize(self.arc_dst[perm], (S, B))
        self.state, stats = self._o2_epoch_jit(self.state, src, dst)
        return self._finish_o2(stats)

    def _finish_o2(self, stats):
        self._o2_stats = stats
        if not self._sync_stats:
            return None
        return self.o2_sync()

    def o2_sync(self) -> float:
        st = np.asarray(self._o2_stats)
        self.last_o2_pairs = float(st[1])
        return float(st[0])

    # --------------------------------------------------------- O3 (community)

    def _o3_step(self, state: TrainState):
        cfg = self.cfg
        p = state.params
        lr = _decayed_lr(
            state.words_seen, self.total_words, cfg.lr, cfg.min_lr
        )
        new_emb = community_sgd_step(
            p.node_emb, p.pi, p.centroid, p.inv_cov, cfg.beta, lr,
            grad_clip=cfg.o3_grad_clip,
        )
        loss = community_loss(
            new_emb, p.pi, p.centroid, p.chol_cov, p.inv_cov, cfg.beta
        )
        return state.replace(params=p.replace(node_emb=new_emb)), loss

    def o3_pass(self) -> float:
        loss = 0.0
        for _ in range(self.cfg.o3_steps_per_iter):
            self.state, loss = self._o3_step_jit(self.state)
        return float(loss) if self._sync_stats else None

    def fit_gmm(self) -> float:
        self.host_key, k = jax.random.split(self.host_key)
        params, ll = fit_communities(
            self.state.params,
            k,
            n_init=self.cfg.gmm_n_init,
            max_iter=self.cfg.gmm_max_iter,
            reg_covar=self.cfg.reg_covar,
            tol=self.cfg.gmm_tol,
        )
        self.state = self.state.replace(params=params)
        return float(ll) if self._sync_stats else None

    # ----------------------------------------------------------------- driver

    def train(
        self,
        labels: np.ndarray | None = None,
        log: Callable[[str], None] | None = None,
        checkpoint_dir: str | None = None,
        scalar_log=None,
    ) -> list[dict]:
        """Full alternating optimization (reference main.py loop, §3.1).

        ``checkpoint_dir``: saves ``state_iter{N}.npz`` after every outer
        iteration (the reference pickled its Model per iteration, SURVEY.md
        C10).  ``scalar_log``: optional metrics.ScalarLog sink.
        """
        import time as _time

        cfg = self.cfg
        say = log or (lambda s: None)
        for e in range(cfg.pretrain_epochs):
            loss = self.o1_epoch()
            say(f"pretrain O1 epoch {e}: loss/pair {loss:.4f}")

        def timed(rec, name, fn):
            # per-phase wall ms (SURVEY §5 observability: per-step scalars
            # incl. where the iteration time goes); valid because each
            # phase returns a host float when stats_sync is on
            t0 = _time.perf_counter()
            out = fn()
            rec[f"{name}_ms"] = round((_time.perf_counter() - t0) * 1e3, 2)
            return out

        for it in range(cfg.outer_iters):
            rec: dict = {"iter": it}
            rec["gmm_ll"] = timed(rec, "gmm", self.fit_gmm)
            for _ in range(cfg.o1_epochs_per_iter):
                rec["o1_loss"] = timed(rec, "o1", self.o1_epoch)
            for _ in range(cfg.o2_epochs_per_iter):
                rec["o2_loss"] = timed(rec, "o2", self.o2_epoch)
            rec["o3_loss"] = timed(rec, "o3", self.o3_pass)
            if labels is not None:
                from come_tpu.evaluation import nmi_score

                rec["nmi"] = nmi_score(labels, self.communities())
            say(
                f"iter {it}: "
                + ", ".join(
                    f"{k}={v:.4f}" for k, v in rec.items() if k != "iter"
                )
            )
            if scalar_log is not None:
                scalar_log.log(it, **{k: v for k, v in rec.items()})
            if checkpoint_dir:
                from pathlib import Path

                cd = Path(checkpoint_dir)
                cd.mkdir(parents=True, exist_ok=True)
                self.save_checkpoint(cd / f"state_iter{it}.npz")
            self._history.append(rec)
        return self._history

    # ----------------------------------------------------------- persistence

    def save_checkpoint(self, path) -> None:
        from come_tpu.iohelpers import save_checkpoint

        save_checkpoint(path, self.state, host_key=self.host_key)

    def load_checkpoint(self, path) -> None:
        from come_tpu.iohelpers import load_checkpoint, load_host_key

        self.state = load_checkpoint(path)
        hk = load_host_key(path)
        if hk is not None:  # bit-exact resume incl. walk/edge permutations
            self.host_key = hk

    # ------------------------------------------------------------------ views

    def embeddings(self) -> np.ndarray:
        return np.asarray(self.state.params.node_emb)

    def communities(self) -> np.ndarray:
        """argmax responsibilities — the reference's NMI input (§3.5)."""
        return np.asarray(jnp.argmax(self.state.params.pi, axis=1))
