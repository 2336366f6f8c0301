"""Chr1-scale assembly orchestration: sparse obs + delta scoring end to end.

The BASELINE configuration the dense pipeline cannot reach (~500k
fragments: a dense S x S observed matrix would be 10^12 cells). This
runner wires the sparse pieces together:

- observed contacts stay as :class:`core.sparse.SparseObs` throughout,
- candidate scoring is the O(|D|^2) mini-state delta engine
  (core.delta), with the static contig-capacity bucket ``f_max`` grown
  geometrically between cycles as contigs coalesce (one re-jit per
  bucket — the reference sizes its kernel workload per step the same way,
  cuda_lib_gl.py:2477-2483),
- the carried likelihood is re-anchored once per cycle by the sparse
  banded full evaluation, which also powers optional per-cycle nuisance
  parameter sampling (per-step sampling would cost a full O(nnz + K*w)
  evaluation per step at this scale; the reference's per-step choice is
  affordable only because its problems are 10^3 bins).

Multi-chip: see parallel.sharding.make_sharded_delta_cycle (chains
sharded over the mesh; the mini-state pair grids are small, so the axis
worth spending devices on is chains, not rows).
"""

from __future__ import annotations

import os
import time

import numpy as np

from graal_tpu.core import delta as delta_mod
from graal_tpu.core import mcmc, sparse
from graal_tpu.core.model import RippeParams
from graal_tpu.core.state import GenomeState, check_invariants, dist_inter_genome
from graal_tpu.core.subfrags import SubFragTable


def _next_pow2(x: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 0)


# Empirical TPU device-safety ceiling for one compiled lax.scan cycle:
# the worker process crashes (UNAVAILABLE "kernel fault") when
# r_max^2 * scan_length grows past ~1.6e9, independent of which
# fragments are visited (bisected on a v5 lite: f_max 2048 x 320 steps
# OK, x 384 crash; f_max 1024 x 1024 OK -> quadratic in r_max, not
# linear). Chunks are capped so the product stays under 8e8 (2x margin).
_SAFE_SCAN_PRODUCT = 8.0e8


def _scan_chunk_cap(f_max: int, s_max: int, n: int, lanes: int = 1) -> int:
    """Max scan steps for one device execution at this capacity bucket.
    ``lanes``: states evaluated concurrently per device (vmapped chains)."""
    r = min(f_max, n) * s_max
    return max(8, int(_SAFE_SCAN_PRODUCT // (r * r * max(lanes, 1))))


def max_contig_subs(state: GenomeState, table: SubFragTable) -> int:
    """Largest contig size measured in sub-fragments (host, O(n log n))."""
    id_c = np.asarray(state.id_c)
    counts = np.asarray(
        delta_mod.build_mini_table(table, allow_repeats=True).sub_count,
        np.float64)
    _, inv = np.unique(id_c, return_inverse=True)
    return int(np.bincount(inv, weights=counts).max())


def contig_frags_per_frag(state: GenomeState) -> np.ndarray:
    """(n,) fragment count of each fragment's contig (host)."""
    id_c = np.asarray(state.id_c)
    _, inv = np.unique(id_c, return_inverse=True)
    return np.bincount(inv)[inv]


class ScaleRunner:
    """One configured chr1-scale assembly run."""

    def __init__(self, table: SubFragTable, sobs: sparse.SparseObs,
                 params: RippeParams, nb: mcmc.NeighbourTable | None = None,
                 band_margin: float = 2.0, id_d=None, bin_csr=None,
                 bin_norm=None):
        """``id_d``: data bin of each copy-fragment — required for repeat
        (copy-expanded) tables so the neighbour/dispatcher tables map
        fragments to data rows; identity when omitted (repeat-free).

        ``bin_csr``/``bin_norm``: bin-grid contact matrix and per-bin
        accu normaliser for the MTM jumping distributions (run_mtm);
        default to the data grid, valid when the two grids coincide
        (one sub per bin — the synthetic scale generators)."""
        import scipy.sparse as sp

        self.table = table
        self.sobs = sobs
        self.params = params
        if nb is None:
            n = sobs.n
            if id_d is None:
                assert not table.has_repeats, \
                    "repeat tables need id_d for the neighbour tables"
                id_d = np.arange(n)
            m = sp.coo_matrix(
                (np.asarray(sobs.vals),
                 (np.asarray(sobs.rows), np.asarray(sobs.cols))),
                shape=(n, n)).tocsr()
            nb = mcmc.build_neighbour_table(m, np.asarray(id_d), len(id_d))
        self.nb = nb
        self.w = sparse.band_width(np.asarray(table.len_kb),
                                   float(params.d_max), margin=band_margin)
        # nuisance d_max proposals must stay inside the band coverage;
        # when the band spans every pair (w >= K-1, small problems) the
        # banded evaluation is exact for ANY d_max — no cap
        if self.w >= table.n_subs - 1:
            self.max_covered_d_max = float("inf")
        else:
            self.max_covered_d_max = float(
                np.sort(np.asarray(table.len_kb))[: self.w].sum())
        self._anchor = None
        self._local_anchor = None
        self._cycles = {}      # f_max bucket -> compiled cycle
        self._nuis = None
        self._bin_csr = bin_csr
        self._bin_norm = bin_norm
        self._id_d = np.asarray(id_d) if id_d is not None else None

    # ---- compiled pieces ---------------------------------------------------
    def anchor_fn(self):
        """Full sparse likelihood re-anchor. On a multi-device host the
        nnz triplets and the banded correction are sharded over a rows
        mesh and psum-reduced (parallel.sharding.make_sharded_sparse_anchor
        — the once-per-cycle anchor stops being a replicated single-device
        serial cost at 500k fragments; repeat tables shard through the
        copy-summing twin); single-device hosts evaluate locally."""
        import jax
        import jax.numpy as jnp

        if self._anchor is None:
            n_dev = len(jax.devices())
            if n_dev > 1:
                self._local_anchor = jax.jit(
                    sparse.make_sparse_loglik(self.table, self.sobs, self.w))
                from graal_tpu.parallel.sharding import (
                    make_mesh, make_sharded_sparse_anchor)

                batched = make_sharded_sparse_anchor(
                    make_mesh(n_chains=1, n_rows=n_dev), self.table,
                    self.sobs, self.w)

                def scalar_anchor(state, params, _b=batched):
                    sb = jax.tree.map(lambda x: jnp.asarray(x)[None], state)
                    pb = jax.tree.map(lambda x: jnp.asarray(x)[None], params)
                    out = _b(GenomeState(*sb), RippeParams(*pb))[0]
                    # Strip the mesh commitment before the scalar leaves:
                    # a NamedSharding-committed operand makes every
                    # downstream jit compile REPLICATED over the whole
                    # mesh — on the 8-virtual-device CPU test rig the
                    # delta cycle's memory multiplied ~8x (measured
                    # 4.8 -> 34 GB for one bucket; the 100k test peaked
                    # >100 GB and OOM-killed full-suite runs).
                    return jnp.float32(jax.device_get(out))

                self._anchor = scalar_anchor
            else:
                self._anchor = jax.jit(
                    sparse.make_sparse_loglik(self.table, self.sobs, self.w))
                self._local_anchor = self._anchor
        return self._anchor

    def local_anchor_fn(self):
        """Single-device sparse anchor — the vmap-safe flavour used inside
        per-chain nuisance sampling (vmapping a shard_mapped anchor is not
        supported)."""
        self.anchor_fn()
        return self._local_anchor

    def scorer(self):
        """Batched sparse full-likelihood scorer (nuisance sampling).

        With a multi-device host (and a repeat-free table) the evaluation
        is routed through the rows-sharded psum anchor
        (parallel.sharding.make_sharded_sparse_anchor) — without this,
        each per-cycle nuisance proposal at 500k fragments paid a full
        serial O(nnz + K*w) evaluation replicated on one device while the
        sharded anchor sat one call away (round-4 review)."""
        import jax
        import jax.numpy as jnp

        n_dev = len(jax.devices())
        if n_dev > 1:
            from graal_tpu.parallel.sharding import (
                make_mesh, make_sharded_sparse_anchor)

            batched = make_sharded_sparse_anchor(
                make_mesh(n_chains=1, n_rows=n_dev), self.table, self.sobs,
                self.w)

            def scorer_fn(sb, p, _b=batched):
                m = jax.tree.leaves(sb)[0].shape[0]
                pb = RippeParams(*[jnp.broadcast_to(jnp.asarray(x), (m,))
                                   for x in p])
                return _b(sb, pb)

            return scorer_fn
        anchor = sparse.make_sparse_loglik(self.table, self.sobs, self.w)
        return lambda sb, p: jax.vmap(lambda s: anchor(s, p))(sb)

    def cycle_for(self, f_max: int, delta: int):
        """Compiled chunk: no internal re-anchor (the runner anchors once
        per cycle; chunks would otherwise pay the full sparse evaluation
        each)."""
        if (f_max, delta) not in self._cycles:
            self._cycles[(f_max, delta)] = delta_mod.make_delta_em_cycle(
                self.table, None, self.nb, delta=delta, f_max=f_max,
                sobs=self.sobs, anchor_fn=False, band_w=self.w)
        return self._cycles[(f_max, delta)]

    def nuisance_step(self):
        import jax

        if self._nuis is None:
            self._nuis = jax.jit(mcmc.make_nuisance_step(
                self.table, None, scorer=self.scorer(),
                d_max_cap=self.max_covered_d_max))
        return self._nuis

    # ---- run ---------------------------------------------------------------
    def run(self, state0: GenomeState, n_cycles: int, delta: int = 4,
            steps_per_cycle: int | None = None, f_max_min: int = 256,
            f_max_cap: int = 1 << 14, f_t: float = 1.0,
            sample_param: bool = False, seed: int = 1, progress: bool = True,
            init_truth: GenomeState | None = None, chunk_steps: int = 512,
            checkpoint_path: str | None = None, checkpoint_every: int = 1,
            resume: bool = False, snapshot_every: int = 0,
            snapshot_dir: str | None = None, chrom_of_bin=None,
            watch: bool = False, order_mode: str = "random"):
        """Assemble from ``state0``. ``steps_per_cycle`` caps the fragment
        steps per cycle (default: every fragment once, like the reference's
        start_EM); ``init_truth`` enables the dist_inter_genome series.

        ``order_mode``: which fragments a SUBSAMPLED cycle visits.
        "random" (default) is the reference's shuffled sweep truncated to
        ``steps_per_cycle``. "extremity" visits contig extremities first
        (shuffled), then fills with shuffled interior fragments. Repairs
        happen at extremities — paste is only valid there
        (cuda_lib_gl.py:828-837) — so at 500k fragments with
        steps_per_cycle=1000, a uniform subsample lands ~10 steps per
        cycle on the ~5000 repairable fragments and the selection
        window's neutral drift dominates (measured: likelihood FELL and
        n_contigs grew over 5 cycles); extremity-first spends the whole
        budget where joins are possible. A full sweep (steps == n) is
        unaffected: every fragment is visited either way.

        ``checkpoint_path``: atomic npz checkpoint written every
        ``checkpoint_every`` cycles (state + params + cycle + RNG key +
        metric history — utils.checkpoint); ``resume=True`` picks the run
        back up bit-exactly from the file when it exists (a kill -9
        mid-assembly costs at most ``checkpoint_every`` cycles — a
        multi-hour 500k run needs this; the dense pipeline has it and the
        reference has nothing, SURVEY.md section 5).

        ``snapshot_every`` + ``chrom_of_bin``: per-cycle genome-layout
        paintings (utils.plots.plot_genome_layout — the chr1-scale stand-in
        for the dense pipeline's matrix snapshots, which would densify)
        written to ``snapshot_dir``.

        ``watch``: refresh ``<snapshot_dir>/live.html`` every cycle — the
        headless live view (utils.live; the reference's GL particle view
        + wx plot, gl_update_pos kernels3.cu:3824-3973 / main_gl.py:811).

        ``chunk_steps`` bounds the length of a single device execution: a
        full chr1-scale cycle in one XLA program runs for tens of minutes,
        which remote-attached devices abort (observed as UNAVAILABLE
        device errors); chunking costs one host round-trip per chunk. The
        last chunk wraps around the permutation (a few fragments sampled
        twice — harmless for MCMC).

        Steps are scheduled on a LADDER of capacity tiers per cycle
        (f_max_min, 2*f_max_min, ... up to the bucket sized for the
        biggest contig): each fragment pays the bucket its own contig
        needs, and a step that fully overflowed a tier (its partner's
        contig was bigger than budgeted) retries at the top tier. One
        chr-scale contig among thousands of small pieces no longer prices
        every step at the worst case — at 500k fragments the worst-case
        two-tier schedule ran ~70% of steps at f_max 4096 (~0.27 s each)
        when their own contigs fit f_max 1024 (~0.02 s)."""
        import jax
        import jax.numpy as jnp

        n = state0.n_frags
        steps = steps_per_cycle or n
        key = jax.random.key(seed)
        state = state0
        params = self.params
        start_cycle = 0
        resumed_metrics = None
        if resume and checkpoint_path and os.path.exists(checkpoint_path):
            from graal_tpu.utils.checkpoint import load_checkpoint

            state, params, start_cycle, key, extra = load_checkpoint(
                checkpoint_path)
            resumed_metrics = {k[2:]: np.asarray(v).tolist()
                               for k, v in extra.items()
                               if k.startswith("m_")}
            if progress:
                print(f"resumed from {checkpoint_path} at cycle "
                      f"{start_cycle}", flush=True)
        anchor = self.anchor_fn()
        l_t = anchor(state, params)
        s_max = delta_mod.build_mini_table(self.table,
                                           allow_repeats=True).s_max

        dist_ref = None
        if init_truth is not None:
            from graal_tpu.core.state import derive_prev_next

            ip, inx = derive_prev_next(init_truth)
            id_d = np.asarray(init_truth.id_d)
            ip = np.where(ip != -1, id_d[np.clip(ip, 0, None)], -1)
            inx = np.where(inx != -1, id_d[np.clip(inx, 0, None)], -1)
            # single-sub bins carry no orientation signal -> unorientable
            orientable = np.asarray(
                delta_mod.build_mini_table(
                    self.table, allow_repeats=True).sub_count) > 1
            dist_ref = (ip, inx, np.asarray(init_truth.ori),
                        orientable, np.zeros(n, bool))

        def run_tier(state, l_t, key, bucket, order_np, f_t):
            """Run ``order_np`` steps at one bucket, chunked on a
            decreasing size ladder (wrapped padding bounded by the
            smallest rung), capped by the per-execution device-safety
            ceiling (_scan_chunk_cap)."""
            cycle = self.cycle_for(bucket, delta)
            outs = []
            i = 0
            cap = _scan_chunk_cap(bucket, s_max, n)
            ladder = sorted({min(c, cap) for c in (chunk_steps, 128, 32)
                             if min(c, cap) <= chunk_steps}, reverse=True)
            while i < len(order_np):
                rem = len(order_np) - i
                chunk = next((c for c in ladder if c <= rem), ladder[-1])
                seg = order_np[i:i + chunk]
                if len(seg) < chunk:   # wrap-pad the tail
                    seg = np.concatenate(
                        [seg, order_np[: chunk - len(seg)]])
                key, k_cycle = jax.random.split(key)
                state, l_t, out = cycle(state, k_cycle, params,
                                        jnp.asarray(seg), l_t,
                                        jnp.float32(f_t))
                outs.append(jax.tree.map(np.asarray, out))
                i += chunk
            return state, l_t, outs, key

        metrics = {"likelihood": [], "n_contigs": [], "overflow": [],
                   "dist_init_genome": [], "f_max": [], "cycle_s": [],
                   "fact": [], "slope": [], "d_max": [], "v_inter": []}
        if resumed_metrics:
            for k in metrics:
                if k in resumed_metrics:
                    metrics[k] = resumed_metrics[k]
        t0 = time.time()
        for j in range(start_cycle, n_cycles):
            big_bucket = _next_pow2(2 * max_contig_subs(state, self.table)
                                    + 2 * s_max)
            big_bucket = int(np.clip(big_bucket, f_max_min, f_max_cap))
            big_bucket = min(big_bucket, _next_pow2(n))
            small_bucket = min(f_max_min, big_bucket)
            key, k_perm, k_nuis = jax.random.split(key, 3)
            if order_mode == "extremity" and steps < n:
                pos_np = np.asarray(state.pos)
                lc_np = np.asarray(state.l_cont)
                ext = (np.asarray(state.activ) == 1) & (
                    (pos_np == 0) | (pos_np == lc_np - 1))
                perm = np.asarray(jax.random.permutation(k_perm, n))
                order = np.concatenate(
                    [perm[ext[perm]], perm[~ext[perm]]])[:steps]
            else:
                order = np.asarray(jax.random.permutation(k_perm, n)[:steps])
            tc = time.time()
            cfrag = contig_frags_per_frag(state)
            # per-step tier: the bucket the step's OWN contig needs (the
            # partner's contig is budgeted by the same doubling; a true
            # overflow retries at the top tier below)
            need = np.clip(2 * cfrag[order] + 2 * s_max + 2,
                           small_bucket, big_bucket)
            tier_of = np.minimum(
                np.left_shift(1, np.ceil(np.log2(need)).astype(np.int64)),
                big_bucket)
            tiers = sorted(set(tier_of.tolist()))
            outs = []
            retry = np.zeros(0, order.dtype)
            for t_ix, tier in enumerate(tiers):
                sel = tier_of == tier
                tier_order = order[sel]
                if t_ix == len(tiers) - 1:   # top tier absorbs retries
                    tier_order = np.concatenate([tier_order, retry])
                    retry = np.zeros(0, order.dtype)
                if not len(tier_order):
                    continue
                state, l_t, outs_t, key = run_tier(
                    state, l_t, key, int(tier), tier_order, f_t)
                outs.extend(outs_t)
                # fully-overflowed steps (no-op, op == -1 with overflow
                # counted) go around again at the top tier
                ops_t = np.concatenate([o[1] for o in outs_t])
                overs_t = np.concatenate([o[3] for o in outs_t])
                src = tier_order if len(ops_t) == len(tier_order) else \
                    np.concatenate([tier_order,
                                    tier_order[: len(ops_t)
                                               - len(tier_order)]])
                retry = np.concatenate(
                    [retry, src[(ops_t == -1) & (overs_t > 0)]])
            if len(retry):   # retries from the top tier itself
                state, l_t, outs_r, key = run_tier(
                    state, l_t, key, big_bucket, retry, f_t)
                outs.extend(outs_r)
            lls, ops_, fbs, overs, ncs = (
                np.concatenate([o[k] for o in outs]) for k in range(5))
            bucket = big_bucket
            l_t = anchor(state, params)   # one re-anchor per cycle
            if sample_param:
                params, l_t, _ = self.nuisance_step()(
                    state, k_nuis, params, l_t, jnp.float32(f_t))
                # strip any mesh commitment from the (sharded) nuisance
                # scorer's outputs before they re-enter the delta cycles —
                # same poison the anchor guards against (anchor_fn)
                params = RippeParams(*[jnp.asarray(jax.device_get(x))
                                       for x in params])
                l_t = jnp.float32(jax.device_get(l_t))
            l_t = jax.block_until_ready(l_t)
            cycle_s = time.time() - tc
            n_over = int(np.sum(np.asarray(overs)))
            nc = int(np.asarray(ncs)[-1])
            metrics["likelihood"].append(float(l_t))
            metrics["n_contigs"].append(nc)
            metrics["overflow"].append(n_over)
            metrics["f_max"].append(bucket)
            metrics["cycle_s"].append(cycle_s)
            for pname in ("fact", "slope", "d_max", "v_inter"):
                metrics[pname].append(float(getattr(params, pname)))
            dist = None
            if dist_ref is not None:
                dist = dist_inter_genome(state, *dist_ref)
                metrics["dist_init_genome"].append(dist)
            if checkpoint_path and checkpoint_every and \
                    (j + 1) % checkpoint_every == 0:
                from graal_tpu.utils.checkpoint import save_checkpoint

                save_checkpoint(
                    checkpoint_path, state, params, j + 1, key,
                    extra={f"m_{k}": np.asarray(v, np.float64)
                           for k, v in metrics.items() if len(v)})
            if snapshot_every and (j + 1) % snapshot_every == 0 \
                    and chrom_of_bin is not None:
                from graal_tpu.utils.plots import plot_genome_layout

                plot_genome_layout(state, chrom_of_bin, snapshot_dir or ".",
                                   out_name=f"layout_{j + 1:04d}.png")
            if watch:
                from graal_tpu.utils import live
                from graal_tpu.utils.plots import plot_genome_layout

                if chrom_of_bin is not None:
                    plot_genome_layout(state, chrom_of_bin,
                                       snapshot_dir or ".",
                                       out_name="layout_latest.png")
                stats = {"cycle": j, "loglik": float(l_t), "n_contigs": nc,
                         "f_max": bucket, "cycle_s": round(cycle_s, 1)}
                if dist is not None:
                    stats["dist"] = dist
                live.update(snapshot_dir or ".", stats,
                            metrics["likelihood"],
                            state=state, chrom_of_bin=chrom_of_bin)
            if progress:
                msg = (f"scale cycle {j}: loglik={float(l_t):.1f} "
                       f"n_contigs={nc} f_max={bucket} overflow={n_over} "
                       f"({cycle_s:.1f}s, total {time.time() - t0:.1f}s)")
                if dist is not None:
                    msg += f" dist={dist:.3f}"
                print(msg, flush=True)
        check_invariants(state)
        self.params = params
        return state, params, metrics

    def run_mtm(self, state0: GenomeState, n_cycles: int, delta: int = 5,
                steps_per_cycle: int | None = None, f_max_min: int = 256,
                f_max_cap: int = 1 << 14, f_t: float = 1.0, seed: int = 1,
                corrected: bool = False, chunk_steps: int = 512,
                variant: str = "mtm", progress: bool = True):
        """MTM (or plain-MH, ``variant='mh'``) refinement at chr1 scale
        (delta-scored; start_MTM's role, main_gl.py:344-399). Typically
        run after :meth:`run` on its output. Copy-expanded (repeat) tables
        route to the repeat-aware delta engine automatically (the
        reference refines repeats through the same dispatcher machinery,
        cuda_lib_gl.py:2936-3069). Returns (state, l_t, metrics)."""
        import jax
        import jax.numpy as jnp
        from graal_tpu.core import mtm as mtm_mod

        n = state0.n_frags
        steps = steps_per_cycle or n
        # jumping distributions on the bin grid (falls back to the data
        # grid when the two coincide — one sub per bin)
        if self._bin_csr is not None:
            bin_m, norm = self._bin_csr, self._bin_norm
        else:
            import scipy.sparse as sp

            nd = self.sobs.n
            if self.table.has_repeats:
                # bin grid = data grid: one data sub per bin; per-bin accu
                # read through any copy (copies share it)
                assert self.table.n_data_sub == nd, \
                    "pass bin_csr/bin_norm when the bin and data grids differ"
                norm = np.zeros(nd, np.float64)
                norm[np.asarray(self.table.data_id)] = \
                    np.asarray(self.table.accu)
            else:
                assert self.table.n_data_sub == n and \
                    bool(np.all(np.asarray(self.table.owner)
                                == np.asarray(self.table.data_id))), \
                    "pass bin_csr/bin_norm when the bin and data grids differ"
                norm = np.bincount(np.asarray(self.table.owner),
                                   weights=np.asarray(self.table.accu),
                                   minlength=nd)
            bin_m = sp.coo_matrix(
                (np.asarray(self.sobs.vals),
                 (np.asarray(self.sobs.rows), np.asarray(self.sobs.cols))),
                shape=(nd, nd)).tocsr()
        id_d = self._id_d if self._id_d is not None else np.arange(n)
        jump = mtm_mod.build_jump_table(bin_m, norm, id_d, n, delta)

        anchor = self.anchor_fn()
        params = self.params
        state = state0
        l_t = anchor(state, params)
        s_max = delta_mod.build_mini_table(self.table,
                                           allow_repeats=True).s_max
        key = jax.random.key(seed)
        metrics = {"likelihood": [], "accept_rate": [], "n_contigs": [],
                   "f_max": []}
        cycles = {}   # per-call: compiled cycles close over this jump table
        t0 = time.time()
        for j in range(n_cycles):
            bucket = _next_pow2(2 * max_contig_subs(state, self.table)
                                + 2 * s_max)
            bucket = int(np.clip(bucket, f_max_min,
                                 min(f_max_cap, _next_pow2(n))))
            if bucket not in cycles:
                make = mtm_mod.make_delta_mtm_step if variant == "mtm" \
                    else mtm_mod.make_delta_mh_step
                step = make(
                    self.table, jump, bucket, self.sobs, band_w=self.w,
                    corrected=corrected)

                @jax.jit
                def cycle(state, key, params, order, l_t, f_t, _step=step):
                    def body(carry, f_a):
                        state, key, l_t = carry
                        key, sub = jax.random.split(key)
                        state, l_t, acc, nc = _step(state, sub, params,
                                                    l_t, f_a, f_t)
                        return (state, key, l_t), (acc, nc)

                    (state, key, l_t), (accs, ncs) = jax.lax.scan(
                        body, (state, key, l_t), order)
                    return state, l_t, accs, ncs

                cycles[bucket] = cycle
            cyc = cycles[bucket]
            key, k_perm = jax.random.split(key)
            order_np = np.asarray(jax.random.permutation(k_perm, n)[:steps])
            accs_all = []
            i = 0
            cap = _scan_chunk_cap(bucket, s_max, n)
            while i < len(order_np):
                chunk = min(chunk_steps, cap, len(order_np) - i)
                key, k_c = jax.random.split(key)
                state, l_t, accs, ncs = cyc(
                    state, k_c, params, jnp.asarray(order_np[i:i + chunk]),
                    l_t, jnp.float32(f_t))
                accs_all.append(np.asarray(accs))
                i += chunk
            l_t = anchor(state, params)   # re-anchor per cycle
            acc_rate = float(np.mean(np.concatenate(accs_all)))
            nc = int(np.asarray(ncs)[-1])
            metrics["likelihood"].append(float(l_t))
            metrics["accept_rate"].append(acc_rate)
            metrics["n_contigs"].append(nc)
            metrics["f_max"].append(bucket)
            if progress:
                print(f"scale mtm cycle {j}: loglik={float(l_t):.1f} "
                      f"accept={acc_rate:.2f} n_contigs={nc} "
                      f"f_max={bucket} ({time.time() - t0:.1f}s)",
                      flush=True)
        check_invariants(state)
        return state, float(l_t), metrics

    def run_chains(self, state0: GenomeState, n_chains: int, n_cycles: int,
                   delta: int = 4, steps_per_cycle: int | None = None,
                   f_max_min: int = 256, f_max_cap: int = 1 << 14,
                   f_t: float = 1.0, t_max: float = 4.0,
                   exchange_every: int = 2, seed: int = 1,
                   sample_param: bool = False, chunk_steps: int = 512,
                   checkpoint_path: str | None = None,
                   checkpoint_every: int = 1, resume: bool = False,
                   progress: bool = True):
        """N parallel-tempered chains from ``state0`` (distinct RNG
        streams), sharded over a (chains, rows) mesh when the device count
        allows — the chr1-scale multi-chip shape: the delta pair grids are
        tiny, so devices go to chains, not rows (module docstring).

        Chain c runs at temperature ``ladder[c]`` (geometric from ``f_t``
        up to ``t_max``; chain 0 is the cold chain). Every
        ``exchange_every`` cycles one round of canonical adjacent-pair
        replica-exchange swaps runs (parallel.tempering.pt_swap) — hot
        chains keep exploring while improvements percolate down; the
        round-1 broadcast-best scheme destroyed the hot chains'
        exploration state and is gone. The final result is the
        argmax-likelihood genome across chains.

        ``sample_param``: per-chain nuisance-parameter Metropolis once per
        cycle at the chain's own temperature. Each chain carries its OWN
        parameter vector; PT swaps migrate (genome, params, likelihood) as
        a unit — canonical PT on the joint chain state. Returns
        (best_state, best_ll, metrics) — with sample_param, metrics also
        carries the best chain's final params under "params".

        ``checkpoint_path``/``resume``: per-cycle atomic npz of the FULL
        tempered ensemble (every chain's genome, params, likelihood, the
        RNG key and swap parity) — resuming continues the run bit-exactly,
        like the single-chain path.
        """
        import jax
        import jax.numpy as jnp
        from graal_tpu.parallel.sharding import make_sharded_delta_cycle
        from graal_tpu.parallel.tempering import pt_swap, temperature_ladder

        n = state0.n_frags
        steps = steps_per_cycle or n
        mesh = _chain_mesh(n_chains)
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape), state0)
        anchor = self.anchor_fn()
        params_c = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_chains,) + jnp.shape(x)),
            self.params)
        l_ts = jnp.broadcast_to(anchor(state0, self.params), (n_chains,))
        ladder = jnp.asarray(temperature_ladder(
            n_chains, t_min=f_t, t_max=max(t_max, f_t)))
        swap = jax.jit(pt_swap, static_argnames=("parity",))
        if mesh.devices.size > 1:
            from graal_tpu.parallel.sharding import make_sharded_sparse_anchor

            anchor_c = make_sharded_sparse_anchor(
                mesh, self.table, self.sobs, self.w)
        else:
            anchor_c = jax.jit(jax.vmap(anchor))
        nuis_c = None
        if sample_param:
            # split nuisance step: the trivial propose/accept halves vmap
            # over chains while the ONE heavy piece — the test-parameter
            # likelihood — goes through the chain-batched anchor (sharded
            # over the mesh when devices allow), instead of vmapping a
            # per-chain single-device evaluation
            propose_c = jax.jit(jax.vmap(
                mcmc.make_nuisance_proposer(
                    d_max_cap=self.max_covered_d_max)))
            accept_c = jax.jit(jax.vmap(mcmc.nuisance_accept))

            def nuis_c(states, keys, params_b, l_ts_b, ladder_b):
                tp, ok, ku = propose_c(keys, params_b)
                l_star = anchor_c(states, tp)
                return accept_c(ku, tp, params_b, l_star, l_ts_b, ladder_b,
                                ok)
        s_max = delta_mod.build_mini_table(self.table,
                                           allow_repeats=True).s_max
        key = jax.random.key(seed)
        cycles = {}
        metrics = {"likelihood": [], "best": [], "f_max": [], "swaps": []}
        swap_round = 0
        start_cycle = 0
        if resume and checkpoint_path and os.path.exists(checkpoint_path):
            with np.load(checkpoint_path) as data:
                states = GenomeState(*[jnp.asarray(data[f"s_{f}"])
                                       for f in GenomeState._fields])
                params_c = RippeParams(*[jnp.asarray(x)
                                         for x in data["params_c"].T])
                l_ts = jnp.asarray(data["l_ts"])
                start_cycle = int(data["cycle"])
                swap_round = int(data["swap_round"])
                key = jax.random.wrap_key_data(jnp.asarray(data["key"]))
                for k in metrics:
                    if f"m_{k}" in data:
                        metrics[k] = np.asarray(data[f"m_{k}"]).tolist()
            if progress:
                print(f"resumed tempered ensemble from {checkpoint_path} "
                      f"at cycle {start_cycle}", flush=True)
        t0 = time.time()
        for j in range(start_cycle, n_cycles):
            # bucket sized for the largest contig across all chains
            big = max(max_contig_subs(
                jax.tree.map(lambda x: x[c], states), self.table)
                for c in range(n_chains))
            bucket = int(np.clip(_next_pow2(2 * big + 2 * s_max),
                                 f_max_min, min(f_max_cap, _next_pow2(n))))
            if bucket not in cycles:
                cycles[bucket] = make_sharded_delta_cycle(
                    mesh, self.table, self.nb, delta=delta, f_max=bucket,
                    sobs=self.sobs, band_w=self.w, per_chain_params=True)
            key, k_perm = jax.random.split(key)
            order = jax.vmap(lambda k: jax.random.permutation(k, n)[:steps])(
                jax.random.split(k_perm, n_chains))
            i = 0
            order_np = np.asarray(order)
            lanes = -(-n_chains // mesh.shape["chains"])   # chains/device
            cap = _scan_chunk_cap(bucket, s_max, n, lanes=lanes)
            while i < steps:
                chunk = min(chunk_steps, cap, steps - i)
                key, k_cyc = jax.random.split(key)
                seg = jnp.asarray(order_np[:, i:i + chunk])
                states, l_ts = cycles[bucket](
                    states, jax.random.split(k_cyc, n_chains), params_c,
                    seg, l_ts, ladder)
                i += chunk
            # re-anchor each chain under its own params (f32 drift control)
            l_ts = anchor_c(states, params_c)
            if nuis_c is not None:
                key, k_nu = jax.random.split(key)
                params_c, l_ts, _ = nuis_c(
                    states, jax.random.split(k_nu, n_chains), params_c,
                    l_ts, ladder)
            n_swaps = 0
            if exchange_every and (j + 1) % exchange_every == 0 \
                    and n_chains > 1:
                key, k_swap = jax.random.split(key)
                (states, params_c), l_ts, acc = swap(
                    (states, params_c), l_ts, ladder, k_swap,
                    parity=swap_round % 2)
                swap_round += 1
                n_swaps = int(np.sum(np.asarray(acc)))
            lls = np.asarray(l_ts)
            metrics["likelihood"].append(lls.tolist())
            metrics["best"].append(float(lls.max()))
            metrics["f_max"].append(bucket)
            metrics["swaps"].append(n_swaps)
            if checkpoint_path and checkpoint_every and \
                    (j + 1) % checkpoint_every == 0:
                arrays = {f"s_{f}": np.asarray(getattr(states, f))
                          for f in GenomeState._fields}
                arrays["params_c"] = np.stack(
                    [np.asarray(x) for x in params_c], axis=1)
                arrays["l_ts"] = np.asarray(l_ts)
                arrays["cycle"] = np.asarray(j + 1, np.int64)
                arrays["swap_round"] = np.asarray(swap_round, np.int64)
                arrays["key"] = np.asarray(jax.random.key_data(key))
                for k, v in metrics.items():
                    if isinstance(v, list) and len(v):
                        arrays[f"m_{k}"] = np.asarray(v, np.float64)
                tmp = checkpoint_path + ".tmp.npz"
                np.savez(tmp, **arrays)
                os.replace(tmp, checkpoint_path)
            if progress:
                print(f"chains cycle {j}: best={lls.max():.1f} "
                      f"spread={lls.max() - lls.min():.1f} swaps={n_swaps} "
                      f"f_max={bucket} ({time.time() - t0:.1f}s)",
                      flush=True)
        best = int(np.argmax(np.asarray(l_ts)))
        final = jax.tree.map(lambda x: np.asarray(x[best]), states)
        final = GenomeState(*[jnp.asarray(a) for a in final])
        check_invariants(final)
        if sample_param:
            metrics["params"] = RippeParams(
                *[jnp.asarray(np.asarray(x)[best]) for x in params_c])
        return final, float(np.asarray(l_ts)[best]), metrics


def from_dataset(dataset_dir: str, size: int, factor: int = 3,
                 level: int | None = None, min_bin_per_contig: int = 1,
                 max_fit_bins: int = 2048, max_dist_bins_factor: float = 1.0,
                 allow_repeats: bool = False, sub_sample: float = 0.0,
                 sub_sample_seed: int = 0, progress: bool = True,
                 ref_quirks: bool = False):
    """Build a :class:`ScaleRunner` straight from a reference-format dataset
    directory — the chr1-scale twin of pipeline.Runner, never densifying:

    - observed contacts: the sub-level's COO triplets -> SparseObs,
    - Rippe fit: model.fit_rippe_from_coo on the same triplets (exact
      searchsorted pair-count denominator), window = mean source-contig
      length * ``max_dist_bins_factor``, capped at ``max_fit_bins``
      distance bins (at chr1 scale the reference's mean-contig window is
      the whole chromosome; the curve flattens to v_inter long before),
    - v_inter: model.mean_value_trans_from_coo,
    - ``allow_repeats``: coverage-outlier bins are duplicated into
      copy-expanded geometry (sparse coverage; the delta engine routes the
      resulting table to the repeat-aware scorer automatically).

    Returns (runner, state0, level_handle, extras) where ``state0`` is the
    file-order genome and ``extras`` carries the fit curve for plots.
    """
    from graal_tpu.core.model import (fit_rippe_from_coo,
                                      mean_value_trans_from_coo)
    from graal_tpu.core.subfrags import table_from_level
    from graal_tpu.io import pyramid as pyramid_io

    from graal_tpu.pipeline import detect_repeats_coverage, extend_with_repeats

    pyr = pyramid_io.build_and_filter(dataset_dir, size, factor,
                                      min_bin_per_contig,
                                      ref_quirks=ref_quirks)
    lvl = min(level if level is not None else size - 1, size - 1)
    lev = pyr.get_level(lvl)
    sub = pyr.get_level(max(lvl - 1, 0))
    soa = lev.genome_soa()
    sub_soa = sub.genome_soa()
    bin_to_subs = pyr.sub_ranges(lvl) if lvl > 0 else \
        np.stack([np.arange(lev.n_frags)] * 2, axis=1)

    # repeat detection from sparse coverage (select_repeated_frags,
    # simulation_loader.py:369-394; detect_repeats_coverage is
    # scale-invariant, so the raw one-orientation row+col sums work)
    duplications = []
    if allow_repeats:
        raw = lev.sparse
        cov = (np.asarray(raw.sum(axis=0)).ravel()
               + np.asarray(raw.sum(axis=1)).ravel()
               - 2.0 * raw.diagonal())
        duplications = detect_repeats_coverage(cov, True)
        soa = extend_with_repeats(soa, duplications)
        if progress and duplications:
            print(f"{len(duplications)} repeated bins, "
                  f"{sum(d for _, d in duplications)} extra copies",
                  flush=True)
    table = table_from_level(
        soa, {"len_bp": sub_soa["len_bp"], "n_accu": sub_soa["n_accu"]},
        bin_to_subs, id_d=soa["id_d"])

    coo = sub.sparse.tocoo()
    sobs = sparse.sparse_from_coo(coo.row, coo.col, coo.data, sub.n_frags)
    if 0.0 < sub_sample <= 1.0:
        # Poisson sub-sampling robustness knob (gen_rand_mat,
        # kernels3.cu:61-77) — applied before the fit, like the dense
        # pipeline, so parameters are estimated from what is scored
        sobs = sparse.subsample_sparse(sobs, sub_sample, sub_sample_seed)
        if progress:
            print(f"sub-sampled contacts by {sub_sample}: "
                  f"{sobs.vals.shape[0]} symmetric nnz", flush=True)
    sr, sc, sv = (np.asarray(sobs.rows), np.asarray(sobs.cols),
                  np.asarray(sobs.vals))

    v_inter = mean_value_trans_from_coo(sr, sc, sv,
                                        np.asarray(sub.frags.chrom))
    starts = sub_soa["pos"] == 0
    mean_dist_kb = float(np.mean(sub_soa["l_cont_bp"][starts])) / 1000.0
    size_bin_kb = float(np.mean(sub_soa["len_bp"])) / 1000.0
    max_dist_kb = min(mean_dist_kb * max_dist_bins_factor,
                      max_fit_bins * size_bin_kb)
    if progress:
        print(f"scale level {lvl}: {lev.n_frags} bins, {sub.n_frags} data "
              f"subs, {sv.shape[0]} symmetric nnz; fitting over "
              f"{max_dist_kb:.0f} kb in {size_bin_kb:.1f} kb bins", flush=True)
    params, bins, mean_contacts, y_estim = fit_rippe_from_coo(
        sr, sc, sv, sub_soa, v_inter, max_dist_kb, size_bin_kb)
    if progress:
        print("fitted params:", {f: round(float(getattr(params, f)), 5)
                                 for f in params._fields}, flush=True)

    state0 = GenomeState.from_soa(soa)
    # neighbour proposals live on the BIN grid (the level matrix, like
    # pipeline.Runner), not on the data grid ScaleRunner would default to —
    # the two only coincide when every bin has exactly one sub-fragment
    m_bin = (lev.sparse + lev.sparse.T).tocsr()
    m_bin.setdiag(0)
    m_bin.eliminate_zeros()
    if 0.0 < sub_sample <= 1.0:
        import scipy.sparse as spsp

        up = spsp.triu(m_bin, k=1).tocoo()
        rng = np.random.default_rng(sub_sample_seed + 1)
        drawn = rng.poisson(np.maximum(up.data * sub_sample, 0.0))
        half = spsp.coo_matrix((drawn.astype(np.float64),
                                (up.row, up.col)), shape=m_bin.shape)
        m_bin = (half + half.T).tocsr()
        m_bin.eliminate_zeros()
    nb = mcmc.build_neighbour_table(m_bin, soa["id_d"], len(soa["id_d"]))
    # MTM jump-table normaliser: per-bin accu mass summed over the bin's
    # data subs (the dense pipeline's norm_vect, pipeline.run_mtm) —
    # copy-expansion-independent, so repeat tables get it too
    cs = np.concatenate(
        [[0.0], np.cumsum(np.asarray(sub_soa["n_accu"], np.float64))])
    bin_norm = cs[bin_to_subs[:, 1] + 1] - cs[bin_to_subs[:, 0]]
    runner = ScaleRunner(table, sobs, params, nb=nb, id_d=soa["id_d"],
                         bin_csr=m_bin, bin_norm=bin_norm)
    extras = {"fit_bins": bins, "fit_contacts": mean_contacts,
              "fit_estim": y_estim, "v_inter": v_inter,
              "duplications": duplications, "pyramid": pyr,
              "level_soa": soa}
    return runner, state0, lev, extras


def run_multilevel(dataset_dir: str, size: int, from_level: int,
                   to_level: int, n_cycles: int, factor: int = 3,
                   delta: int = 4, f_max_min: int = 256, f_t: float = 1.0,
                   sample_param: bool = False, seed: int = 1,
                   max_fit_bins: int = 2048, progress: bool = True):
    """Coarse-to-fine sparse assembly: assemble at ``from_level`` from a
    scrambled start, then refine level by level down to ``to_level`` with
    orientation-aware projected warm starts (multilevel.project_state_to_sub
    — the same cascade the dense pipeline runs, never densifying).

    Returns (final_state, last_runner, last_level_handle, metrics_per_level).
    """
    import jax
    from graal_tpu.multilevel import project_state_to_sub

    assert from_level >= to_level >= 0
    state = None
    prev_final = None
    all_metrics = []
    runner = lev = None
    for lvl in range(from_level, to_level - 1, -1):
        runner, state0, lev, extras = from_dataset(
            dataset_dir, size, factor, level=lvl,
            max_fit_bins=max_fit_bins, progress=progress)
        if prev_final is None:
            state = jax.jit(mcmc.explode_genome)(state0)
        else:
            soa = project_state_to_sub(
                prev_final, extras["pyramid"].sub_ranges(lvl + 1),
                np.asarray(extras["level_soa"]["len_bp"]))
            soa["id_d"] = np.arange(len(soa["pos"]))
            state = GenomeState.from_soa(soa)
        final, _, metrics = runner.run(
            state, n_cycles=n_cycles, delta=delta, f_max_min=f_max_min,
            f_t=f_t, sample_param=sample_param, seed=seed + lvl,
            init_truth=state0, progress=progress)
        all_metrics.append({"level": lvl, **metrics})
        prev_final = final
    return prev_final, runner, lev, all_metrics


def _chain_mesh(n_chains: int):
    """Largest mesh chains-axis that divides both the chain count and the
    device count (1 => all chains vmapped on one device)."""
    import jax
    from graal_tpu.parallel.sharding import make_mesh

    n_dev = len(jax.devices())
    ax = 1
    for d in range(min(n_chains, n_dev), 0, -1):
        if n_chains % d == 0 and n_dev % d == 0:
            ax = d
            break
    return make_mesh(n_chains=ax, n_rows=n_dev // ax,
                     devices=jax.devices()[: n_dev])
