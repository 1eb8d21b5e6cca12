"""Branch & bound MILP driver with batched, device-resident node LP solves.

Host-side rewrite of the reference's B&B orchestrator
(src/sypha_solver_bnb_driver.cpp:163-1167), preserving its control policies:

  phase 1    greedy set-cover incumbent                     (:263-292)
  phase 2    incumbent cost cutoff + budget pruning         (:294-306)
  phase 2.5  cost-driven pair/triplet reduction             (:308-320)
  phase 2.7  dominance rules                                (:322-334)
  phase 3    root LP + root heuristics + exact-root check   (:336-397)
  phase 4/5  second reduction + dominance                   (:399-415)
  phase 6.5  root cut rounds                                (:436-584)
  phase 6.7  post-cut budget pruning                        (:586-615)
  main loop  bound pruning, reliable-bound gating, integral
             incumbents, most-fractional branching, frontier
             pruning, mid-B&B reductions, gap-stagnation LP
             iteration throttling, hard time limit,
             LP-fallback                                    (:695-1158)

TPU-first deviations:
* The frontier window is solved as a real vmapped batch (solve_node_batch) —
  the reference's DeviceNodeWindow stages nodes on device but still solves
  them one at a time (SURVEY §2.3 item 2).
* Column removal is masking (BaseModel.deactivate): the padded LP keeps one
  static shape for the whole run, so node remapping reduces to dropping
  nodes that fixed a masked column to 1.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from dataclasses import dataclass, field
from collections import deque
from typing import List, Optional

import numpy as np

from sypha_tpu.config import SolverConfig
from sypha_tpu.core.problem import ScpModel
from sypha_tpu.core.status import IpmStatus, MilpStatus
from sypha_tpu.io.standard_form import pad_standard_form, pad_standard_form_ell
from sypha_tpu.milp.base_model import BaseModel, BranchNode
from sypha_tpu.milp.cuts import separate_cuts
from sypha_tpu.milp.heuristics import (
    fractional_candidates,
    is_binary_integral,
    run_heuristics,
    select_branch_variable,
)
from sypha_tpu.milp.presolve import (
    apply_presolve_rules,
    greedy_set_cover,
    incumbent_budget_pruning,
)
from sypha_tpu.utils.logging import Logger


@dataclass
class MilpResult:
    status: MilpStatus
    objective: float  # incumbent (inf if none)
    dual_bound: float
    mip_gap: float
    nodes_processed: int = 0
    total_lp_iterations: int = 0
    solution: np.ndarray = field(default_factory=lambda: np.zeros(0))
    incumbent_source: str = "none"
    wall_time_sec: float = 0.0
    root_cuts: int = 0
    tree_cuts: int = 0
    # one-time XLA precompile seconds EXCLUDED from the hard time budget
    # (the reference's C++ is AOT-compiled so its budget never pays
    # compilation; ours extends the deadline by exactly this much).
    # wall_time_sec is already net of it; callers timing the whole call
    # externally should subtract it before comparing against the limit.
    compile_time_sec: float = 0.0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Standard padded-column rungs for compact/core CHILD solves: every fresh
# bucket shape costs a 50-300 s remote compile (and the cross-process
# cache is unreliable), so children snap their padded width to this
# ladder — faces of different sizes across a family sweep then share one
# executable set and only the first instance pays.  1.25-1.5x spacing
# bounds the padding waste; full-size parents keep natural 128-rounding
# (family members already share those shapes exactly).
_STD_RUNGS = (
    128, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096, 6144, 8192,
    12288, 16384,
)


def _std_bucket_cols(n: int) -> int:
    for r in _STD_RUNGS:
        if n <= r:
            return r
    return _round_up(n, 1024)


def compute_mip_gap(incumbent: float, dual_bound: float) -> float:
    """reference compute_mip_gap (src/sypha_solver_bnb.cpp:405-416)."""
    if not (np.isfinite(incumbent) and np.isfinite(dual_bound)):
        return np.inf
    if dual_bound > incumbent:
        return np.inf
    return (incumbent - dual_bound) / max(1.0, abs(incumbent))


def tighten_dual_bound(bound: float, tol: float) -> float:
    """ceil(bound - tol) for integral objectives (src/sypha_solver_bnb.cpp:398-403).

    Deviation from the reference: the tolerance is widened by a
    scale-aware term 1e-7 * max(1, |bound|) because a CONVERGED dual
    objective at our 1e-8 relative-gap target can still exceed the true
    LP optimum by ~gap * |obj| (~5e-6 at obj ~500) — ceiling through that
    error once turned a true bound of 494+4e-6 into 495 and "proved" a
    wrong optimum on scp44.  The widened tolerance only ever weakens the
    tightening, never the soundness."""
    if not np.isfinite(bound):
        return bound
    safety = tol + 1e-7 * max(1.0, abs(bound))
    return float(np.ceil(bound - safety))


class _NodeLpSolver:
    """Owns the padded base LP on device and the bucket bookkeeping.

    Branch decisions are per-lane column fixings on the shared-matrix
    batched IPM (ipm.node_batch) — the model shape never changes with tree
    depth, so the whole B&B runs on one compiled executable per base model.
    """

    # row/column headroom reserved for future cuts so appending cuts does not
    # change the padded bucket (and so does not trigger an XLA recompile)
    CUT_HEADROOM = 64

    def __init__(self, base: BaseModel, cfg: SolverConfig, log: Logger, mesh=None):
        self.base = base
        self.cfg = cfg
        self.log = log
        self.mesh = mesh  # jax Mesh => windows dispatch lane-sharded
        # latched True by solve_nodes when a dispatch dies with a device-loss
        # error (remote TPU worker crash / tunnel backend fault); every later
        # window degrades to _failed_window and the main loop stops dispatching
        self.device_lost = False
        self._device_base = None
        self._inactive = None
        self._bucket = (0, 0)  # sticky: only grows, to keep compiles cached
        # EMA of wall seconds per IPM iteration PER LANE RUNG (keyed by B):
        # sizes deadline chunks.  Rungs differ by ~50x (B=1 vs B=64), so a
        # shared estimate once let a window run 60 iterations in one ~30 s
        # dispatch and overshoot a 120 s budget by 40 s.
        self._sec_per_iter = {}
        # None until the first build; then sticky for the solver's lifetime
        self._use_ell = None

    def _rebuild_device_base(self):
        base = self.base
        m0 = base.nrows
        n0 = base.ncols
        n_real = n0 + m0
        # the bucket grows ONLY when the model no longer fits: re-adding
        # the headroom on top of a cut-grown model would move the bucket
        # (1219+64 -> 1408 while 1219 still fits in 1280) and force a
        # mid-solve XLA recompile that room_for_cuts() was built to prevent
        mp, np_ = self._bucket
        if m0 > mp:
            mp = _round_up(m0 + self.CUT_HEADROOM, 32)
        if n_real > np_:
            np_ = max(
                _round_up(n_real + self.CUT_HEADROOM, 128),
                self.cfg.bnb.bucket_cols_floor,
            )
        self._bucket = (mp, np_)
        # operator pick (reference auto semantics, src/sypha_solver.cpp:
        # 291-316): padded-ELL sparse below the measured density crossover,
        # dense above; the choice is sticky per bucket (switching operators
        # mid-solve would change the jit signature and force a recompile)
        rows = base.row_arrays()
        if self._use_ell is None:
            op = self.cfg.bnb.node_operator
            nnz = sum(len(idx) for idx, _, _ in rows) + m0
            density = nnz / float(max(1, m0 * n_real))
            self._use_ell = op == "ell" or (
                op == "auto" and density <= self.cfg.bnb.node_ell_density
            )
            if self._use_ell:
                self.log.info(
                    f"node-LP operator: padded-ELL sparse "
                    f"(density {density * 100:.2f}%)"
                )
        if self._use_ell:
            lp = pad_standard_form_ell(
                [(idx, val) for idx, val, _ in rows],
                np.asarray([r for _, _, r in rows], dtype=np.float64),
                base.effective_costs(),
                n_struct=n0,
                m_pad=mp,
                n_pad=np_,
            )
        else:
            A, b, c, _ = base.standard_form(None)
            lp = pad_standard_form(A, b, c, n_struct=n0, m_pad=mp, n_pad=np_)
        self._device_base = lp
        # presolve-masked columns are fixed to 0 in every lane
        inactive = np.zeros(np_, dtype=np.float64)
        inactive[: self.base.ncols] = ~self.base.active
        self._inactive = inactive
        self.log.debug(f"node-LP bucket: base {m0}x{n_real} padded to {mp}x{np_}")

    def refresh(self):
        """Base model changed (cuts appended or columns masked)."""
        self._device_base = None

    def room_for_cuts(self) -> int:
        """How many more cut rows fit inside the current padded bucket.

        Each cut adds one row AND one surplus column to the standard form;
        exceeding either padding would grow the bucket and force an XLA
        recompile (~minutes through the remote-compile tunnel), so in-tree
        separation must stay inside this budget.  Before the first build
        the bucket is unset: report the headroom the build will reserve."""
        if self._bucket == (0, 0):
            return self.CUT_HEADROOM
        m_now = self.base.nrows
        n_now = self.base.ncols + m_now
        return max(0, min(self._bucket[0] - m_now, self._bucket[1] - n_now))

    def _dispatch(self, fix0, fix1, opts, warm, resume, iter_limit):
        """One device dispatch: single-device jit or mesh-sharded."""
        import jax.numpy as jnp

        if self.mesh is not None:
            from sypha_tpu.parallel.mesh import solve_node_batch_sharded

            return solve_node_batch_sharded(
                self._device_base, fix0, fix1, opts, self.mesh,
                warm=warm, resume=resume, iter_limit=iter_limit,
            )
        from sypha_tpu.ipm.node_batch import solve_node_batch

        return solve_node_batch(
            self._device_base, fix0, fix1, opts, warm, resume,
            jnp.asarray(iter_limit, jnp.int32),
        )

    def precompile(self, opts_list, deadline_used: bool) -> float:
        """Compile every executable the B&B will dispatch, up front.

        XLA compiles through this environment's remote-compile tunnel cost
        20-300 s per executable and the persistent cache is unreliable
        across processes (CLAUDE.md); letting them land inside the hard
        time budget turns a "120 s run" into a compile lottery.  The
        reference's C++ is ahead-of-time compiled — its budget never pays
        compilation — so the driver calls this BEFORE starting the clock.
        Compiles each (opts, rung) cold variant plus, when a deadline will
        chunk solves, the resume variant.  Returns elapsed seconds.
        """
        import jax
        import jax.numpy as jnp

        t0 = time.monotonic()
        if self._device_base is None:
            self._rebuild_device_base()
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        rungs = sorted({max(1, n_dev), _round_up(self.cfg.bnb.node_batch, n_dev)})
        np_ = self._device_base.n_pad
        mp = self._device_base.m_pad
        for opts in opts_list:
            for B in rungs:
                fix0 = jnp.zeros((B, np_))
                fix1 = jnp.zeros((B, np_))
                st, *_ = self._dispatch(fix0, fix1, opts, None, None, 1)
                jax.device_get(st.status)
                if self.cfg.bnb.warm_start_nodes:
                    # warm variant: a DIFFERENT jit signature — uncompiled,
                    # the first warm window would pay a remote compile
                    # (~60 s) inside the timed region
                    warm = (
                        jnp.ones((B, np_), jnp.float32),
                        jnp.ones((B, mp), jnp.float32),
                        jnp.ones((B, np_), jnp.float32),
                    )
                    stw, *_ = self._dispatch(fix0, fix1, opts, warm, None, 1)
                    jax.device_get(stw.status)
                if deadline_used:
                    st2, *_ = self._dispatch(fix0, fix1, opts, None, st, 2)
                    jax.device_get(st2.status)
        return time.monotonic() - t0

    def solve_nodes(
        self,
        nodes: List[BranchNode],
        opts,
        deadline: float = np.inf,
        total_iters: Optional[int] = None,
    ):
        """Device-loss guard around :meth:`_solve_nodes_impl`: a crashed
        remote TPU worker (kernel fault) poisons every later dispatch in
        this process, so the window degrades to INFEASIBLE_OR_NUMERICAL
        lanes — the driver's status lattice already treats those soundly
        (no pruning, subtree recorded in numerical_failures) — and
        ``self.device_lost`` tells the main loop to stop dispatching."""
        if self.device_lost:
            return self._failed_window(nodes)
        try:
            return self._solve_nodes_impl(nodes, opts, deadline, total_iters)
        except Exception as e:  # noqa: BLE001 — filtered to device loss
            if not _is_device_loss(e):
                raise
            self.device_lost = True
            self.log.warn(f"device lost during node window: {e}")
            return self._failed_window(nodes)

    def _failed_window(self, nodes: List[BranchNode]):
        return [
            {
                "status": IpmStatus.INFEASIBLE_OR_NUMERICAL,
                "iterations": 0,
                "x": np.zeros(self.base.ncols),
                "y": np.zeros(self.base.nrows),
                "pobj": np.inf,
                "dobj": -np.inf,
                "res_d": np.inf,
                "warm": None,
            }
            for _ in nodes
        ]

    def _solve_nodes_impl(
        self,
        nodes: List[BranchNode],
        opts,
        deadline: float = np.inf,
        total_iters: Optional[int] = None,
    ):
        """Solve a batch of node LPs; returns host-side per-node dicts.

        ``deadline`` (absolute time.monotonic()) bounds the wall time: the
        solve dispatches in iteration chunks with a host clock check
        between dispatches, so overshoot is ~one chunk rather than a whole
        window solve (reference per-iteration watchdog,
        src/sypha_solver.cpp:498-502).  Lanes stopped early report
        MAX_ITER; the driver's weak-duality path still extracts bounds.

        ``total_iters`` overrides opts.max_iter as the per-lane iteration
        budget WITHOUT changing the compiled executable (the cap is a
        traced scalar) — how the driver's gap-stagnation throttling avoids
        a second compile.
        """
        import jax
        import jax.numpy as jnp

        if self._device_base is None:
            self._rebuild_device_base()

        # pad the lane count to a fixed ladder (1, then multiples of the
        # window size) by replicating the last node, so XLA compiles one
        # executable per rung instead of one per frontier size; on a mesh
        # the rung must also divide by the mesh size
        B_real = len(nodes)
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        if B_real == 1:
            B = n_dev  # single solves use the smallest mesh-divisible rung
        else:
            B = _round_up(_round_up(B_real, self.cfg.bnb.node_batch), n_dev)
        np_ = self._device_base.n_pad
        mp = self._device_base.m_pad
        fix0 = np.broadcast_to(self._inactive, (B, np_)).copy()
        fix1 = np.zeros((B, np_), dtype=np.float64)
        # parent-iterate warm start: all-or-nothing per batch (lanes without
        # a parent iterate would otherwise need a second compiled variant)
        use_warm = B_real > 0 and self.cfg.bnb.warm_start_nodes and all(
            n.warm is not None
            and n.warm[0].shape[0] == np_  # bucket unchanged since parent
            and n.warm[1].shape[0] == mp
            for n in nodes
        )
        if use_warm:
            xw = np.empty((B, np_), dtype=np.float32)
            yw = np.empty((B, mp), dtype=np.float32)
            sw = np.empty((B, np_), dtype=np.float32)
        for li in range(B):
            node = nodes[min(li, B_real - 1)]
            for d in node.decisions:
                if d.value == 1:
                    fix1[li, d.var] = 1.0
                    fix0[li, d.var] = 0.0
                else:
                    fix0[li, d.var] = 1.0
            if use_warm:
                xw[li], yw[li], sw[li] = node.warm

        warm = (
            (jnp.asarray(xw), jnp.asarray(yw), jnp.asarray(sw))
            if use_warm
            else None
        )
        fix0j, fix1j = jnp.asarray(fix0), jnp.asarray(fix1)

        bnb = self.cfg.bnb
        total = total_iters if total_iters is not None else opts.max_iter
        rung_spi = self._sec_per_iter.get(B)

        def note_spi(spi: float):
            nonlocal rung_spi
            rung_spi = spi if rung_spi is None else 0.5 * rung_spi + 0.5 * spi
            self._sec_per_iter[B] = rung_spi

        def next_chunk(remaining_iters: int) -> int:
            if rung_spi is None:
                return max(2, min(remaining_iters, bnb.iter_chunk))
            return max(
                2,
                min(
                    remaining_iters,
                    int(bnb.iter_chunk_target_sec / max(rung_spi, 1e-6)),
                ),
            )

        if not np.isfinite(deadline):
            # no deadline: single dispatch; still measure sec/iter so a
            # later deadline-bound call can size its first chunk
            t0 = time.monotonic()
            st, x_full, pobj, dobj = self._dispatch(
                fix0j, fix1j, opts, warm, None, total
            )
            iters = np.asarray(jax.device_get(st.iterations))
            note_spi((time.monotonic() - t0) / max(1.0, float(iters.max())))
        else:
            # chunked dispatches with a host clock check between chunks
            done = 0
            resume = None
            st = x_full = pobj = dobj = None
            while True:
                limit = min(total, done + next_chunk(total - done))
                t0 = time.monotonic()
                st, x_full, pobj, dobj = self._dispatch(
                    fix0j, fix1j, opts,
                    warm if resume is None else None, resume, limit,
                )
                status_h = np.asarray(jax.device_get(st.status))
                note_spi((time.monotonic() - t0) / max(1.0, float(limit - done)))
                done = limit
                resume = st
                if not np.any(status_h == int(IpmStatus.MAX_ITER)):
                    break  # every lane terminated for a real reason
                if (
                    done >= total
                    or time.monotonic() >= deadline
                    or self.log.is_stop_requested()
                ):
                    # deadline/watchdog: with chunked dispatches the async
                    # stop flag now interrupts a RUNNING solve between
                    # chunks (the reference polls its watchdog every IPM
                    # iteration, src/sypha_solver.cpp:498-502)
                    break
        host = jax.device_get(
            {
                "status": st.status,
                "iterations": st.iterations,
                "gap": st.gap,
                "res_d": st.res_d,
                "x": x_full,
                "y": st.y,
                "pobj": pobj,
                "dobj": dobj,
                "xr": st.x,
                "sr": st.s,
            }
        )
        n0 = self.base.ncols
        m_all = self.base.nrows  # covering + global cut rows
        out = []
        for li in range(B_real):
            out.append(
                {
                    "status": IpmStatus(int(host["status"][li])),
                    "iterations": int(host["iterations"][li]),
                    "x": host["x"][li][:n0],
                    "y": host["y"][li][:m_all],
                    "pobj": float(host["pobj"][li]),
                    "dobj": float(host["dobj"][li]),
                    "res_d": float(host["res_d"][li]),
                    # padded iterate for children's warm starts (f32 halves
                    # the frontier's host memory footprint); only kept when
                    # warm starts are enabled
                    "warm": (
                        host["xr"][li].astype(np.float32),
                        host["y"][li].astype(np.float32),
                        host["sr"][li].astype(np.float32),
                    )
                    if self.cfg.bnb.warm_start_nodes
                    else None,
                }
            )
        return out


class _AsyncClosure:
    """Runs the exact-cover refutation LADDER on a background thread.

    The native DFS (csrc sypha_exact_cover, via ctypes → GIL released) is
    pure host work while the node windows are pure device work: running
    them CONCURRENTLY gives the refutation ladder the whole wall clock
    instead of alternating with the tree (the r2 design blocked the loop
    for every 8-120 s session — on scpnre1 that starved the tree to 16
    nodes in 300 s).

    The worker SELF-CHAINS the bottom-up ladder (refute level b, then
    b+1, ...) instead of waiting for the main loop to schedule each probe
    — the main thread polls between node windows, so a mid-run XLA
    compile (100 s+ through the remote-compile pool) used to leave the
    worker idle for its whole duration even when each refutation took
    under 2 s (measured on scp46: 0.5 s refutes separated by 105 s
    gaps).  Results stream through a queue the main thread drains; the
    shared box carries the live incumbent ceiling / proven floor down
    and lets the main thread request a stop between slices.

    Thread-safety: the worker reads ``base.active`` (and the immutable
    cost/mask arrays) while the main thread may MASK more columns.  Masking
    only clears bits, and every intermediate mask is a superset of the
    final one, so any torn read is itself an improving-solution-preserving
    active set — a refutation over it is globally valid.  Results are only
    APPLIED by the main thread via poll_all().
    """

    def __init__(self, base: BaseModel, int_tol: float, log: Logger):
        self.base = base
        self.int_tol = int_tol
        self.log = log
        self._thread = None
        self._results = queue.SimpleQueue()
        self._shared = None

    def busy(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def update(self, best_obj: float, floor: float):
        """Publish the live incumbent ceiling and proven floor: the worker
        reads them between slices (fast-forwards past levels the tree
        proved, stops once the ladder reaches incumbent-1)."""
        if self._shared is not None:
            self._shared["best_obj"] = best_obj
            self._shared["floor"] = floor

    def stop(self):
        """Request the ladder end after the CURRENT slice (the native DFS
        runs to its own deadline and cannot be interrupted)."""
        if self._shared is not None:
            self._shared["stop"] = True

    def extend_deadline(self, deadline_mono: float):
        """Move the ladder's wall-clock deadline (precompile extends the
        solve budget after an early ladder has already started)."""
        if self._shared is not None:
            self._shared["deadline"] = deadline_mono

    def start_ladder(
        self,
        probe0: float,
        best_obj: float,
        seed_fn,
        deadline_mono: float,
        last_refute_sec: float,
        attempts: dict,
        first_slice_cap: Optional[float] = None,
    ):
        """Run refutations from ``probe0`` upward until incumbent-1 is
        refuted (incumbent optimal), a cover is found (new incumbent —
        the main thread restarts the ladder), time runs out, or stop is
        requested.  ``seed_fn() -> (duals, cuts)`` is re-read before every
        slice so later (stronger) LP duals arm later probes.  ``attempts``
        persists per-level inconclusive counts across ladder restarts.
        ``first_slice_cap`` bounds the first slice so a ladder started
        just before the compact rebase cannot outlive the rebase by more
        than that (the rebase delegates to a child solve whose own worker
        would otherwise share the host core with a stale parent slice)."""
        assert not self.busy()
        from sypha_tpu.milp.presolve import exact_small_cover

        shared = {
            "best_obj": best_obj,
            "floor": probe0,
            "stop": False,
            # live: extend_deadline() moves it when precompile extends the
            # hard budget (the early pre-precompile ladder otherwise sizes
            # its all-in final proof against the UN-extended deadline,
            # wastes the slice, and the stateless DFS restarts from zero)
            "deadline": deadline_mono,
        }
        self._shared = shared
        base, tol, results = self.base, self.int_tol, self._results

        def work():
            level = probe0
            last_ref = last_refute_sec
            first = True
            try:
                # deprioritize the ladder thread (Linux: PRIO_PROCESS with
                # a TID sets that thread's nice): on a 1-CPU host the DFS
                # (GIL released) otherwise steals ~half the cycles from
                # the main thread's root heuristics — the ladder should
                # soak the IDLE windows (remote-compile HTTP waits, device
                # dispatches), not compete with host phases
                try:
                    os.setpriority(
                        os.PRIO_PROCESS, threading.get_native_id(), 10
                    )
                except (OSError, AttributeError):
                    pass
                while not shared["stop"]:
                    ceiling = shared["best_obj"] - 1.0
                    fl = shared["floor"]
                    if np.isfinite(fl):
                        level = max(level, float(np.round(fl)))
                    if level > ceiling + tol:
                        break
                    remaining = shared["deadline"] - time.monotonic()
                    no_deadline = not np.isfinite(remaining)
                    if no_deadline:
                        # no wall-clock deadline: re-arm in short slices so
                        # shared["stop"] is honored promptly (the native
                        # DFS is uninterruptible once dispatched — a single
                        # 600 s slice would keep burning a host core long
                        # after stop(), e.g. into the next solve of a
                        # sequential benchmark sweep)
                        remaining = 60.0
                    if remaining < 1.0:
                        break
                    rk = ("refute", int(round(level)))
                    fk = ("find", int(round(ceiling)))
                    ra, fa = attempts.get(rk, 0), attempts.get(fk, 0)
                    # pincer: once the bottom-up level stalled twice, spend
                    # a slice probing TOP-DOWN at incumbent-1 (a refutation
                    # there is the optimality proof outright)
                    if level < ceiling - 1e-9 and ra >= fa + 2:
                        kind, lvl, att = "find", ceiling, fa
                    else:
                        kind, lvl, att = "refute", level, ra
                    # refuting the ceiling IS the optimality proof: go
                    # all-in immediately — the DFS is stateless, so a
                    # failed half-clock attempt would leave the retry LESS
                    # time than the attempt that just failed
                    final_proof = kind == "refute" and lvl >= ceiling - 1e-9
                    if final_proof:
                        # all-in on a real deadline; with no deadline,
                        # escalate re-armed slices (stateless DFS: same-
                        # budget retries are wasted, but each re-arm
                        # re-checks stop)
                        slice_sec = (
                            min(60.0 * (3.0 ** att), 600.0)
                            if no_deadline
                            else remaining
                        )
                    else:
                        base_slice = (
                            max(20.0, 5.0 * last_ref) if last_ref else 15.0
                        )
                        slice_sec = min(base_slice * (3.0 ** att), 300.0)
                    slice_sec = min(slice_sec, remaining)
                    if first and first_slice_cap is not None:
                        slice_sec = min(slice_sec, first_slice_cap)
                    first = False
                    duals, cuts = seed_fn()
                    t0 = time.monotonic()
                    v, x = exact_small_cover(
                        base, lvl + tol, time_limit_sec=slice_sec,
                        duals=duals, cuts=cuts,
                    )
                    sec = time.monotonic() - t0
                    results.put(dict(kind=kind, level=lvl, verdict=v, x=x, sec=sec))
                    if v is False:
                        if kind == "find":
                            break  # incumbent proven optimal
                        last_ref = sec
                        level = lvl + 1.0
                    elif v is True:
                        break  # found a cover: main applies + restarts
                    else:
                        attempts[(kind, int(round(lvl)))] = att + 1
            except Exception as e:  # never kill the solve from the worker
                results.put(dict(
                    kind="refute", level=0.0, verdict=None, x=None,
                    sec=0.0, err=repr(e),
                ))

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def poll_all(self):
        """Non-blocking: drain every finished slice result, oldest first."""
        out = []
        while True:
            try:
                out.append(self._results.get_nowait())
            except queue.Empty:
                break
        return out

    def join(self, timeout: float):
        if self._thread is not None:
            self._thread.join(timeout=max(0.0, timeout))


def _compact_scp(base: BaseModel, keep: np.ndarray, name: str):
    """Compact a masked BaseModel to the kept columns as a fresh ScpModel.

    Returns (model, cols): ``cols`` maps compact column j -> original index
    (the TPU-side analogue of the reference's hActiveToInputCols map,
    src/sypha_node_sparse.h:44).  Only covering rows carry over — cuts are
    re-derived by the delegated search (dropping columns from a >= cut row
    would keep it valid, but stale cuts are worth less than a clean
    separation on the reduced model)."""
    cols = np.flatnonzero(keep)
    col_map = -np.ones(base.ncols, dtype=np.int64)
    col_map[cols] = np.arange(len(cols))
    rows = [col_map[r[keep[r]]].astype(np.int32) for r in base.cols_by_row]
    return (
        ScpModel(
            nrows=base.nrows_cover,
            ncols=len(cols),
            costs=base.costs[cols].copy(),
            rows=rows,
            name=name,
        ),
        cols,
    )


def _save_checkpoint(path: str, payload: dict, log: Logger) -> None:
    """Atomic snapshot of the search state (new capability vs the reference,
    which restarts from scratch on a kill — SURVEY §5 checkpoint/resume)."""
    import pickle
    import os
    import tempfile

    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
        log.debug(f"checkpoint saved to {path} ({payload['processed']} nodes)")
    except OSError as e:
        log.warn(f"checkpoint save failed: {e}")
        try:
            os.unlink(tmp)
        except OSError:
            pass


def _load_checkpoint(path: str, log: Logger) -> Optional[dict]:
    import os
    import pickle

    if not path or not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        log.info(
            f"Resuming from checkpoint {path}: {payload['processed']} nodes, "
            f"incumbent {payload['best_obj']:.12g}, "
            f"frontier {len(payload['frontier'])}"
        )
        return payload
    except (OSError, pickle.UnpicklingError, KeyError) as e:
        log.warn(f"checkpoint load failed ({e}); starting fresh")
        return None


def branch_and_bound(
    model: ScpModel,
    cfg: Optional[SolverConfig] = None,
    log: Optional[Logger] = None,
    mesh=None,
    restrict_active=None,
    warm_incumbent=None,
    warm_lower=None,
    warm_duals=None,
    _compact_depth: int = 0,
    _pool=None,
) -> MilpResult:
    """MILP branch & bound.  ``mesh`` (or cfg.bnb.mesh_devices > 0) runs
    every node window lane-sharded over the device mesh
    (parallel.mesh.solve_node_batch_sharded); across processes the
    incumbent/dual-bound/stop scalars pool via BoundPool each round — the
    only cross-host traffic, mirroring the host variables of the reference
    (src/sypha_solver_bnb_driver.cpp:256-261, :1048-1079).

    ``restrict_active`` (bool mask over columns) restricts the search to a
    column subset — used by the core-search phase.  Incumbents found under
    a restriction are globally valid covers; OPTIMAL status and dual bounds
    are only valid WITHIN the restriction (the caller must discard them).
    ``warm_incumbent`` = (x_struct, objective) seeds the incumbent.
    ``warm_lower`` seeds a PROVEN global dual bound (the compact re-solve
    passes the parent's, so face-probe ladders resume instead of
    restarting at the child's root LP floor).  ``warm_duals`` seeds the
    closure ladder with the parent's best covering-row duals (rows are
    unchanged by compaction) so the refutation ladder can run DURING the
    child's precompile instead of idling behind it.

    Multi-process protocol: BoundPool is an async KV-store publish/read —
    sync() never blocks on a peer, so hosts in different phases (compile
    ladders, different tree shapes) cannot stall each other.  What every
    top-level exit path MUST still do is run pool.finalize(): departure
    accounting — finalize's drain loop waits for every process to mark
    itself departed, so a host that skips it leaves its peers polling
    forever.  Recursive calls (compact re-solve, core search) share the
    caller's pool via ``_pool`` for namespace-counter alignment (each
    BoundPool construction bumps a per-process counter; all processes must
    construct pools in the same order to read each other's keys) and so
    only the one top-level owner runs the departure protocol."""
    from sypha_tpu.parallel.distributed import BoundPool

    owner = _pool is None
    pool = _pool if _pool is not None else BoundPool()
    if not owner or pool.n_processes <= 1:
        return _branch_and_bound(
            model, cfg, log, mesh, restrict_active, warm_incumbent,
            warm_lower, warm_duals, _compact_depth, pool,
        )
    try:
        res = _branch_and_bound(
            model, cfg, log, mesh, restrict_active, warm_incumbent,
            warm_lower, warm_duals, _compact_depth, pool,
        )
    except BaseException:
        # keep answering the peers' collective cadence before propagating
        # (objective +inf / bound +inf donate nothing; stop_peers=False —
        # a local crash must not end a healthy peer's search)
        pool.finalize(np.inf, np.inf, False)
        raise
    # a proof of optimality/infeasibility CLOSES the shared search: peers
    # replicating the same instance should stop.  A local time/node limit
    # does not (peers may have budget left) — we only donate our final
    # incumbent/bound until everyone departs.
    stop_peers = res.status in (MilpStatus.OPTIMAL, MilpStatus.ABNORMAL)
    pool.finalize(
        res.objective,
        res.dual_bound if np.isfinite(res.dual_bound) else np.inf,
        stop_peers,
        solution=(
            res.solution
            if np.isfinite(res.objective) and res.solution.size
            else None
        ),
    )
    return res


def _is_device_loss(e: Exception) -> bool:
    """True for runtime errors meaning the TPU device/worker is gone: the
    remote worker crashing mid-run (UNAVAILABLE, kernel fault — observed
    repeatedly on 1000x10000 shapes) or the tunnel's transient backend
    faults.  Both poison every subsequent dispatch in this process, so the
    search loop degrades to a host-state finalize instead of losing the
    run (the reference's equivalent failure simply aborts,
    src/sypha_solver_bnb_driver.cpp error paths)."""
    msg = str(e)
    return (
        "worker process crashed" in msg
        or "TPU backend error" in msg
        or ("UNAVAILABLE" in msg and "TPU" in msg)
    )


def _branch_and_bound(
    model: ScpModel,
    cfg: Optional[SolverConfig],
    log: Optional[Logger],
    mesh,
    restrict_active,
    warm_incumbent,
    warm_lower,
    warm_duals,
    _compact_depth: int,
    pool,
) -> MilpResult:
    cfg = cfg or SolverConfig()
    log = log or Logger(verbosity=cfg.verbosity)
    t_start = time.monotonic()
    bnb = cfg.bnb
    if mesh is None and bnb.mesh_devices > 0:
        from sypha_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(bnb.mesh_devices)
    px_tol = 1e-12
    int_tol = bnb.integrality_tol
    mip_gap_tol = 2.0 * cfg.ipm.tol_gap

    # absolute wall-clock deadline every device dispatch AND every bounded
    # host phase (heuristics, local search) respects; chunked solves check
    # it between iteration chunks — hard limits are hard
    _hard0 = (
        bnb.hard_time_limit_sec
        if bnb.hard_time_limit_sec > 0
        else (cfg.time_limit_sec if cfg.time_limit_sec > 0 else 0.0)
    )
    deadline = t_start + _hard0 if _hard0 > 0 else np.inf
    # Root-phase budget guard: the optional root phases (Lagrangian greedy,
    # cut rounds, core search) must leave the TREE at least
    # (1 - root_time_frac) of the hard budget.  Without this, a 10000-col
    # instance's root pipeline ate a whole 130 s session (scpnrg2/scpnrh1
    # reported iterations=0 — the tree never started).  The mandatory root
    # phases (reductions, root LP) still run under the full deadline: a
    # tree without a root LP bound is useless.  Shifts with t_start when
    # precompile extends the budget.
    tree_by = (
        t_start + bnb.root_time_frac * _hard0
        if (_hard0 > 0 and bnb.root_time_frac > 0)
        else np.inf
    )

    def root_budget(cap: float) -> float:
        """Clamp an optional root-phase budget so it cannot push the tree
        start past ``tree_by`` (and never past the hard deadline)."""
        lim = min(deadline, tree_by)
        if not np.isfinite(lim):
            return cap
        return max(0.05, min(cap, lim - time.monotonic()))

    base = BaseModel(model)
    n_input = model.ncols
    if restrict_active is not None:
        base.deactivate(np.flatnonzero(base.active & ~np.asarray(restrict_active)))
        log.debug(f"Restricted search: {base.n_active}/{n_input} columns active")

    obj_is_integral = bool(
        np.all(np.abs(base.costs - np.floor(base.costs + 0.5)) <= int_tol)
    )
    if obj_is_integral:
        log.info("Objective coefficients are integral; enabling dual bound tightening")

    best_obj = np.inf
    best_solution = np.zeros(n_input)
    incumbent_source = "none"
    global_lower = np.inf
    global_lower_raw = np.inf

    def adopt(x_struct: np.ndarray, source: str, objective: float):
        nonlocal best_obj, best_solution, incumbent_source
        best_obj = objective
        best_solution = (x_struct[:n_input] > 0.5).astype(np.float64)
        incumbent_source = source
        # polish every new incumbent with 1-column-removal local search
        # (heuristics.local_search_improve) — cheap host work that often
        # shaves the last unit off repair-heuristic covers
        from sypha_tpu.milp.heuristics import local_search_improve

        ls_budget = min(2.0, max(0.0, deadline - time.monotonic()))
        if ls_budget <= 0.05:
            return
        x_ls, obj_ls = local_search_improve(
            base, best_solution, time_budget_sec=ls_budget
        )
        if obj_ls < best_obj - px_tol and base.is_cover(x_ls):
            log.info(
                f"Local search improved incumbent {best_obj:.12g} -> {obj_ls:.12g}"
            )
            best_obj = obj_ls
            best_solution = (x_ls > 0.5).astype(np.float64)
            incumbent_source = source + "+local_search"

    if warm_incumbent is not None and np.isfinite(warm_incumbent[1]):
        best_solution = (np.asarray(warm_incumbent[0])[:n_input] > 0.5).astype(
            np.float64
        )
        best_obj = float(warm_incumbent[1])
        incumbent_source = "warm_incumbent"

    # ---- phase 1: greedy incumbent ----
    log.info("BnB preprocessing: running greedy set cover heuristic")
    greedy = greedy_set_cover(base)
    if greedy.feasible and greedy.objective < best_obj - px_tol:
        x = np.zeros(n_input)
        x[greedy.selected] = 1.0
        adopt(x, "greedy_set_cover", greedy.objective)
        log.info(f"Greedy heuristic incumbent: {best_obj:.12g}")

    # ---- early incumbent exchange (multi-process) ----
    # Publish the warm/greedy incumbent BEFORE the root phases and adopt
    # whatever a peer already has: finalize-only publishing races a peer
    # whose entire tree lasts milliseconds (warm-seeded root proofs), and
    # an adopted incumbent makes every reduction below stronger.  The
    # reference's incumbent is a host variable shared from t=0
    # (src/sypha_solver_bnb_driver.cpp:256-258); this is its cross-process
    # analogue.  Non-blocking: an unpublished peer donates nothing.
    if pool.n_processes > 1:
        pooled0 = pool.sync(
            best_obj,
            np.inf,  # no proven dual bound yet; +inf donates nothing
            False,
            solution=(best_solution if np.isfinite(best_obj) else None),
        )
        if pooled0.incumbent < best_obj - px_tol:
            sol0 = pooled0.incumbent_solution
            if sol0 is not None and sol0.shape[0] >= n_input:
                cand0 = (sol0[:n_input] > 0.5).astype(np.float64)
                cost0 = float(base.costs @ cand0)
                if (
                    abs(cost0 - pooled0.incumbent)
                    <= px_tol * max(1.0, abs(cost0))
                    and base.is_cover(cand0)
                ):
                    best_solution = cand0
                    best_obj = pooled0.incumbent
                    incumbent_source = "pooled_remote"
                    log.info(f"Pooled remote incumbent: {best_obj:.12g}")

    # ---- phase 2 / 2.5 / 2.7: reductions ----
    def reduce_by_incumbent():
        if not np.isfinite(best_obj):
            return 0
        too_costly = np.flatnonzero(base.active & (base.costs + px_tol >= best_obj))
        return base.deactivate(too_costly)

    removed = reduce_by_incumbent()
    removed += incumbent_budget_pruning(
        base, best_obj, px_tol, cfg.preprocess_time_limit_sec
    )
    if removed:
        log.info(f"Greedy incumbent reduction: {removed} cols masked, {base.n_active} active")
    removed = apply_presolve_rules(
        base, "cost_driven_replacement", px_tol, cfg.preprocess_time_limit_sec
    )
    if removed:
        log.info(f"Cost-driven pair/triplet reduction: {removed} cols masked")
    removed = apply_presolve_rules(
        base, cfg.preprocess_column_strategies, px_tol, cfg.preprocess_time_limit_sec
    )
    if removed:
        log.info(f"Pre-LP dominance reduction: {removed} cols masked")

    solver = _NodeLpSolver(base, cfg, log, mesh=mesh)
    root = BranchNode()
    if warm_lower is not None and np.isfinite(warm_lower):
        # inherited PROVEN bound (compact re-solve parent): the search
        # resumes from it instead of re-proving the root LP floor
        root.parent_dual_bound = max(root.parent_dual_bound, warm_lower)
        root.parent_dual_bound_raw = max(root.parent_dual_bound_raw, warm_lower)
    # B&B node LPs (mask-heavy lanes, warm starts, reduced models) are much
    # harder on the f32-preconditioned PCG than clean instance batches:
    # give them more PCG headroom than the throughput-tuned LP default
    ipm_opts = cfg.ipm.replace(
        newton_max_steps=max(cfg.ipm.newton_max_steps, 48)
    )

    # ---- early closure ladder (compact re-solve children) ----
    # Precompile blocks the host on remote-compile HTTP waits (GIL
    # released) for 20-120 s while the native DFS is pure host work:
    # running the refutation ladder CONCURRENTLY reclaims that window
    # (measured scpnre5: the child's 52 s precompile used to leave the
    # ladder idle while its refute-26 alone needs ~25 s).  Only possible
    # with inherited parent state — the parent's covering-row duals stay
    # valid because compaction never changes rows — so this arms only when
    # the rebase passes warm_duals + a proven warm_lower floor.
    closure_seed = {"y": None, "mass": 0.0, "cut_w": None, "ncuts": 0}
    if warm_duals is not None:
        # inherited parent duals arm the ladder until the first root LP
        # supersedes them (note_closure_seed keeps the larger mass)
        _wy = np.ascontiguousarray(np.asarray(warm_duals, dtype=np.float64))
        closure_seed["y"] = _wy
        closure_seed["mass"] = float(
            np.clip(_wy[: base.nrows_cover], 0.0, None).sum()
        )
    early_closure = None
    if (
        closure_seed["mass"] > 1e-9
        and bnb.exact_closure
        and bnb.async_closure
        and obj_is_integral
        and np.isfinite(best_obj)
        and warm_lower is not None
        and np.isfinite(warm_lower)
        # same reach gate as async_closure_step: beyond ~1k active columns
        # probe sessions are inconclusive churn even with good duals
        and base.n_active <= 1024
    ):
        from sypha_tpu import native as _native

        if _native.get_lib() is not None:
            _probe0 = float(np.round(warm_lower))
            if _probe0 <= best_obj - 1.0 + int_tol:
                early_closure = _AsyncClosure(base, int_tol, log)
                early_closure.start_ladder(
                    _probe0,
                    best_obj,
                    # live view: stronger in-run duals supersede the
                    # inherited ones as soon as note_closure_seed lands
                    lambda: (closure_seed["y"], None),
                    deadline,
                    0.0,
                    {},
                )

    compile_total = 0.0
    if bnb.precompile:
        # compile every (opts, window-rung) executable BEFORE the clock
        # starts: the reference's C++ is AOT-compiled, so its hard time
        # budget never pays compilation; ours shouldn't either (remote
        # compiles here are 20-300 s each and the persistent cache is
        # unreliable across processes)
        _pre_opts = [
            ipm_opts,
            ipm_opts.replace(
                gap_stall_window=bnb.gap_stall_branch_iters,
                gap_stall_min_improv=bnb.gap_stall_min_improv_pct / 100.0,
            ),
        ]
        compile_s = solver.precompile(_pre_opts, deadline_used=_hard0 > 0)
        if compile_s > 1.0:
            log.info(
                f"Precompiled node-LP executables in {compile_s:.1f}s "
                "(excluded from the time budget)"
            )
        t_start += compile_s
        deadline += compile_s
        tree_by += compile_s
        compile_total = compile_s
        if early_closure is not None:
            early_closure.extend_deadline(deadline)

    def solve_single(node: BranchNode):
        return solver.solve_nodes([node], ipm_opts, deadline)[0]

    def integral_cover(res) -> bool:
        """LP point is 0/1-integral AND a genuine cover (an infeasible lane
        can terminate on an all-zero, trivially 'integral' point)."""
        return is_binary_integral(res["x"], base.ncols, int_tol) and base.is_cover(
            np.clip(np.floor(res["x"] + 0.5), 0, 1)
        )

    def usable_bound(res) -> bool:
        """A status whose dual objective is a valid bound: CONVERGED, or a
        stalled/capped solve whose dual iterate is (near-)feasible — weak
        duality (see the main loop's weak_ok path)."""
        if not (
            np.isfinite(res["dobj"])
            and np.isfinite(res["pobj"])
            and res["dobj"] <= res["pobj"] + 1e-6
        ):
            return False
        if res["status"] == IpmStatus.CONVERGED:
            return True
        return (
            res["status"] in (IpmStatus.GAP_STALLED, IpmStatus.MAX_ITER)
            and res.get("res_d", np.inf) <= 1e-7
        )

    def reduced_cost_fix(res) -> int:
        """Reduced-cost fixing (no reference counterpart — SCIP-style):
        from a (near-)dual-feasible y with safe bound z = b.y - sum_j
        max(0, -r_j), any column whose reduced cost satisfies
        z + max(r_j, 0) > cutoff cannot appear in a solution better than
        the incumbent (x_j is binary), so it is masked globally.  On SCP
        plateaus this is the bound-side lever: each fixing round shrinks
        the model, the reduced-root LP bound climbs, and the ceil
        tightening converts fractional progress into integer bound steps.
        """
        if not np.isfinite(best_obj) or not usable_bound(res):
            return 0
        cutoff = (
            best_obj - 1.0 + int_tol if obj_is_integral else best_obj - px_tol
        )
        m_all = base.nrows
        y = np.maximum(np.asarray(res["y"][:m_all], dtype=np.float64), 0.0)
        # r = c - A^T y over structural columns (covering rows + cut rows,
        # all with nonnegative coefficients, so clamping y keeps y >= 0
        # feasible and only relaxes A^T y <= c)
        Arel, rhs = base.rel_csr()
        r = base.costs - Arel.T @ y
        bound_base = float(rhs @ y) - float(np.sum(np.maximum(0.0, -r)))
        fixable = base.active & (bound_base + np.maximum(r, 0.0) > cutoff + 1e-9)
        return base.deactivate(np.flatnonzero(fixable))

    def node_coverable(node: Optional[BranchNode]) -> bool:
        """Sound feasibility certificate for a node's LP: a covering LP
        (all rows '>=', nonneg coefficients — cuts included) is feasible
        iff every row can be covered by some allowed column.  Used to
        distinguish GENUINE infeasibility (fixings/maskings kill a row)
        from a numerically mis-flagged solve: only the former may prune or
        prove optimality."""
        allowed = base.active.copy()
        if node is not None:
            for d in node.decisions:
                if d.value == 0:
                    allowed[d.var] = False
                else:
                    allowed[d.var] = True  # fixed-to-1 columns always help
        cov = np.zeros(base.nrows_cover, dtype=bool)
        for j in np.flatnonzero(allowed):
            cov[base.rows_by_col[j]] = True
        return bool(cov.all())

    def try_heuristics(res, node, thorough: bool = True) -> bool:
        nonlocal global_lower
        improved = False
        for h in run_heuristics(
            base, bnb.int_heuristics, res["x"], res["y"], node, int_tol,
            thorough=thorough,
        ):
            if h.feasible and h.objective < best_obj - px_tol:
                adopt(h.solution, h.name, h.objective)
                improved = True
                log.info(f"New incumbent from heuristic '{h.name}': {h.objective:.12g}")
        return improved

    # Best closure seed: covering-row duals with the LARGEST positive mass
    # seen on any converged root-level solve.  Once a CG cut lands, the
    # re-solved LP's dual mass migrates to the CUT row (measured on
    # scpnre1: after one cut, sum(y[:nrows_cover]) dropped 21.38 -> 0.0,
    # the whole optimum carried by the cut dual) — and the exact-cover
    # engine's dual-ascent bound only understands covering rows, so
    # seeding it with post-cut duals starved every probe session.  Keep
    # the pre-cut duals alive here for closure AND for the dual-ordered
    # cut separators.
    # closure_seed itself is initialized before the precompile block (the
    # early ladder needs it); note_closure_seed below keeps the best-mass
    # covering duals seen on any converged root-level solve

    def note_closure_seed(r):
        if r is None or r["status"] != IpmStatus.CONVERGED:
            return
        y_full = np.asarray(r["y"])
        y = np.clip(y_full[: base.nrows_cover], 0.0, None)
        # cut-row duals (rows nrows_cover..nrows in cut-list order): their
        # Lagrangian mass w_c * rhs_c counts toward the seed quality — the
        # cut-strengthened bound EXCEEDS the plain LP bound the covering
        # ascent is capped by, so post-cut duals (mass on the cut row) are
        # the STRONGER seed once the engine understands cut rows
        ncuts = len(base.cuts)
        wc = (
            np.clip(y_full[base.nrows_cover : base.nrows_cover + ncuts],
                    0.0, None)
            if len(y_full) >= base.nrows_cover + ncuts
            else np.zeros(ncuts)
        )
        # Rank seeds by COVERING mass only.  Counting the cut rows' w*rhs
        # here let a post-cut seed (covering mass 14.6 on scpnre3, the
        # rest parked on the cut row) displace the plain-LP seed (covering
        # mass 20.5) — and the engine's adaptive reallocation only works
        # the covering rows, so every later probe ran ~6 units weaker.
        # Cut mass is also POISONOUS in-tree even when the engine receives
        # it (measured on the scpnre3 budget-23 face with joint (y,w)
        # scaling: refute 47.9s covering-only vs TIMEOUT at 280s with the
        # cut armed): the static w*max(0, rho_res) term evaporates as
        # residuals saturate while the covering mass it displaced would
        # have reallocated adaptively at every node.
        mass = float(y.sum())
        if np.isfinite(mass) and mass > closure_seed["mass"]:
            closure_seed["y"] = y.copy()
            closure_seed["mass"] = mass
            closure_seed["cut_w"] = wc.copy()
            closure_seed["ncuts"] = ncuts

    def closure_cuts():
        """(w, coef, rhs) for the seed's cut rows — base.cuts only appends,
        so the seed's prefix is always intact.  Gated by
        bnb.closure_use_cuts (measured net-neutral/harmful; see config)."""
        ncuts = closure_seed["ncuts"]
        wc = closure_seed["cut_w"]
        if not bnb.closure_use_cuts:
            return None
        if not ncuts or wc is None or not np.any(wc > 1e-12):
            return None
        cl = base.cuts[:ncuts]
        coef = np.zeros((ncuts, base.ncols))
        for ci, c in enumerate(cl):
            coef[ci, c.indices] = c.values
        return (wc, coef, np.asarray([c.rhs for c in cl], dtype=np.float64))

    # ---- phase 3: root LP + heuristics + exact-root check ----
    lagrangian_pool: List = []
    log.info("BnB preprocessing: solving root LP relaxation")
    res = solve_single(root)
    note_closure_seed(res)
    root_ok = res["status"] in (
        IpmStatus.CONVERGED, IpmStatus.MAX_ITER, IpmStatus.GAP_STALLED
    )
    if root_ok:
        try_heuristics(res, root)
        if integral_cover(res) and res["pobj"] < best_obj - px_tol:
            adopt(res["x"], "presolve_exact_root_lp", res["pobj"])
        # CFT-style Lagrangian greedy: only when the root integer gap is
        # wide enough that threshold repair clearly left units on the table
        # (easy scp4/5-class roots close to within 1 unit and skip this)
        root_gap = best_obj - np.ceil(res["dobj"] - int_tol)
        if (
            bnb.lagrangian_samples > 0
            and (not np.isfinite(best_obj) or root_gap >= bnb.lagrangian_min_gap)
        ):
            from sypha_tpu.milp.heuristics import lagrangian_greedy_covers

            lg = lagrangian_greedy_covers(
                base,
                res["y"],
                node=root,
                time_budget_sec=root_budget(bnb.lagrangian_budget_sec),
                max_samples=bnb.lagrangian_samples,
                best_known=best_obj,
                keep_pool=12 if bnb.core_time_frac > 0 else 0,
            )
            lagrangian_pool = lg.pool
            if lg.feasible and lg.objective < best_obj - px_tol:
                log.info(
                    f"Lagrangian greedy incumbent: {best_obj:.12g} -> "
                    f"{lg.objective:.12g}"
                )
                adopt(lg.solution, lg.name, lg.objective)
        if usable_bound(res):
            root_dual = res["dobj"]
            if warm_lower is not None and np.isfinite(warm_lower):
                root_dual = max(root_dual, warm_lower)
            global_lower_raw = (
                max(global_lower_raw, root_dual)
                if np.isfinite(global_lower_raw)
                else root_dual
            )
            if obj_is_integral:
                root_dual = tighten_dual_bound(root_dual, int_tol)
            global_lower = (
                max(global_lower, root_dual)
                if np.isfinite(global_lower)
                else root_dual
            )
        fixed = reduced_cost_fix(res)
        if fixed:
            log.info(
                f"Root reduced-cost fixing: {fixed} cols masked, "
                f"{base.n_active} active"
            )
            solver.refresh()
    else:
        log.info("Root LP did not converge, continuing without incumbent bound")

    def gap_closed() -> bool:
        """Incumbent already meets the proven bound: every remaining root
        phase (cuts, core search, closure) is pure overhead.  The measured
        scp41 run burned ~20 s of its 35 s in cut rounds + face probing
        AFTER the root LP had closed the gap (VERDICT r2 weak #3)."""
        return (
            np.isfinite(best_obj)
            and np.isfinite(global_lower)
            and compute_mip_gap(best_obj, global_lower) <= mip_gap_tol
        )

    # ---- phase 4/5: second reduction + dominance ----
    removed = reduce_by_incumbent()
    removed += incumbent_budget_pruning(
        base, best_obj, px_tol, cfg.preprocess_time_limit_sec
    )
    removed += apply_presolve_rules(
        base, cfg.preprocess_column_strategies, px_tol, cfg.preprocess_time_limit_sec
    )
    if removed:
        log.info(f"LP incumbent reduction: {removed} cols masked, {base.n_active} active")
        solver.refresh()

    # ---- phase 6.5: root cut rounds ----
    _hard = _hard0

    def time_up() -> bool:
        return (
            _hard > 0 and (time.monotonic() - t_start) >= _hard
        ) or log.is_stop_requested()

    def host_budget(cap: float) -> float:
        """Clamp a host-phase time budget (presolve rules, exact closure,
        local search) to the wall time actually remaining, so late-run
        host work cannot push past the hard limit."""
        if not np.isfinite(deadline):
            return cap
        return max(0.05, min(cap, deadline - time.monotonic()))

    root_cuts = 0
    cut_sigs = set()

    def fresh_cuts(cuts, cap):
        """Drop cuts already in the model (the same CG aggregation often
        re-separates at many nodes) and respect the padded-bucket budget."""
        out = []
        for cu in cuts:
            if len(out) >= cap:
                break
            sig = (
                round(cu.rhs, 9),
                cu.indices.tobytes(),
                np.round(cu.values, 9).tobytes(),
            )
            if sig in cut_sigs:
                continue
            cut_sigs.add(sig)
            out.append(cu)
        return out

    # Root cut rounds cannot close a many-unit integer gap (nrg-class: LP
    # bound 149 vs incumbent 175) but each round costs a full root LP
    # re-solve (~30 s at 1000x10000) — skip them when the gap is hopeless
    # and leave the budget to the incumbent side (core search + tree).
    _root_gap_units = (
        best_obj - global_lower
        if np.isfinite(best_obj) and np.isfinite(global_lower)
        else 0.0
    )
    _cuts_hopeless = (
        bnb.cut_skip_gap > 0
        and obj_is_integral
        and _root_gap_units > bnb.cut_skip_gap
    )
    if _cuts_hopeless:
        log.info(
            f"Skipping root cut rounds: integer gap {_root_gap_units:.0f} "
            f"units > cut_skip_gap {bnb.cut_skip_gap:.0f}"
        )
    if (
        bnb.cuts_enabled
        and bnb.cut_rounds_root > 0
        and not _cuts_hopeless
        and not gap_closed()
    ):
        for cut_round in range(bnb.cut_rounds_root):
            if time_up():
                log.info("Time limit reached during root cut rounds")
                break
            # closure-reach gate (r5): once rc-fixing has shrunk the active
            # set into the exact-cover DFS's sweet spot, the async ladder
            # proves the gap in ~seconds — further cut rounds only bill LP
            # re-solves + separation against it (scp51: 3 rounds x ~6 s at
            # 111 active columns that the DFS refutes in <1 s)
            if (
                bnb.exact_closure
                and obj_is_integral
                and base.n_active <= 384
            ):
                log.info(
                    f"Stopping root cut rounds: {base.n_active} active "
                    "columns are within exact-closure reach"
                )
                break
            if time.monotonic() >= tree_by:
                log.info(
                    "Root-phase budget reached during cut rounds "
                    f"(root_time_frac={bnb.root_time_frac:g}); starting tree"
                )
                break
            res = solve_single(root)
            note_closure_seed(res)
            if res["status"] not in (
                IpmStatus.CONVERGED, IpmStatus.MAX_ITER, IpmStatus.GAP_STALLED
            ):
                log.info(f"Cut round {cut_round + 1}: LP solve failed, stopping cuts")
                break
            if usable_bound(res):
                # a root-relaxation dual is a valid GLOBAL lower bound, and
                # so is whatever global_lower already holds (root LP floor,
                # inherited warm_lower, face refutations): keep the max —
                # min() regressed an inherited compact-parent bound of 26
                # to the cut-LP's 22 on scpnre1
                cut_dual = res["dobj"]
                global_lower_raw = (
                    max(global_lower_raw, cut_dual)
                    if np.isfinite(global_lower_raw)
                    else cut_dual
                )
                if obj_is_integral:
                    cut_dual = tighten_dual_bound(cut_dual, int_tol)
                global_lower = (
                    max(global_lower, cut_dual)
                    if np.isfinite(global_lower)
                    else cut_dual
                )
            fixed = reduced_cost_fix(res)
            if fixed:
                log.info(
                    f"Cut round {cut_round + 1}: reduced-cost fixing masked "
                    f"{fixed} cols ({base.n_active} active)"
                )
                solver.refresh()
            if integral_cover(res) and res["pobj"] < best_obj - px_tol:
                adopt(res["x"], "cut_round_exact", res["pobj"])
                log.info(f"Cut round {cut_round + 1}: LP integral, incumbent {best_obj:.12g}")
                break
            try_heuristics(res, root)
            cuts = separate_cuts(
                base, res["x"], res["y"], int_tol, bnb.max_cuts_per_round,
                incumbent=best_obj, obj_is_integral=obj_is_integral,
            )
            cuts = fresh_cuts(cuts, solver.room_for_cuts())
            if not cuts:
                log.info(f"Cut round {cut_round + 1}: no violated cuts found, stopping")
                break
            base.add_cuts(cuts)
            root_cuts += len(cuts)
            solver.refresh()
            log.info(
                f"Cut round {cut_round + 1}: added {len(cuts)} cuts "
                f"(total {root_cuts}, model now {base.nrows} rows)"
            )

    # ---- phase 6.7: post-cut budget pruning ----
    if np.isfinite(best_obj):
        removed = incumbent_budget_pruning(
            base, best_obj, px_tol, cfg.preprocess_time_limit_sec
        )
        if removed:
            log.info(f"Post-cut budget pruning: {removed} cols masked")
            solver.refresh()

    # ---- phase 6.8: core (kernel) search ----
    # On large-gap instances (nrg/nrh class: LP relaxation weak, the full
    # tree cannot close within budget), recursively run this same B&B
    # restricted to a small column core — incumbent support + sampled
    # Lagrangian cover supports + smallest-reduced-cost columns.  The
    # restricted tree is orders of magnitude smaller, so within its time
    # slice the search (cuts, reduced-cost fixing, exact closure — all
    # core-valid) digs several incumbent units deeper than heuristics can.
    # Only the incumbent transfers back (a cover over a subset of columns
    # is a cover); the restricted run's bounds and OPTIMAL claims are
    # discarded.  Classic kernel-search / CFT core strategy; no reference
    # counterpart.
    if (
        restrict_active is None
        and bnb.core_time_frac > 0
        and np.isfinite(best_obj)
        and base.n_active >= bnb.core_min_active
        and (
            not np.isfinite(global_lower)
            or best_obj - global_lower >= bnb.lagrangian_min_gap
        )
        and not time_up()
    ):
        res_c = solve_single(BranchNode())
        if res_c["status"] != IpmStatus.INFEASIBLE_OR_NUMERICAL:
            y_c = np.maximum(0.0, res_c["y"][: base.nrows_cover])
            A_cov = base.rel_csr()[0][: base.nrows_cover]
            rc_base = base.costs - A_cov.T @ y_c
            core_mult = bnb.core_mult
            widened = False
            for core_round in range(max(1, bnb.core_rounds)):
                if time_up() or time.monotonic() >= tree_by:
                    break
                support = np.flatnonzero(best_solution > 0.5)
                core = set(int(j) for j in support)
                for _, cx in lagrangian_pool:
                    core |= set(int(j) for j in np.flatnonzero(cx > 0.5))
                rc = rc_base.copy()
                rc[~base.active] = np.inf
                # FILL the core up to the standard bucket rung the child
                # will land on after its own compact rebase: the compile
                # is paid per RUNG, so the extra best-rc columns between
                # the natural target and the rung boundary ride along free
                # (and family sweeps share the rung's executables)
                target = core_mult * max(1, len(support))
                rung = _std_bucket_cols(
                    target + base.nrows_cover + _NodeLpSolver.CUT_HEADROOM
                )
                filled = rung - base.nrows_cover - _NodeLpSolver.CUT_HEADROOM
                if filled < base.n_active:
                    # filling past n_active would make the "core" the whole
                    # problem; keep the natural target instead
                    target = filled
                for j in np.argsort(rc):
                    if len(core) >= target:
                        break
                    if base.active[j]:
                        core.add(int(j))
                core_mask = np.zeros(n_input, dtype=bool)
                core_mask[list(core)] = True
                # masked columns were removed by improving-solution-
                # preserving arguments: never resurrect them into the core
                core_mask &= base.active
                slice_sec = bnb.core_time_cap_sec
                if np.isfinite(deadline):
                    slice_sec = min(
                        slice_sec,
                        bnb.core_time_frac
                        * max(0.0, deadline - time.monotonic()),
                    )
                # never let a core slice push the tree start past tree_by
                slice_sec = min(slice_sec, root_budget(slice_sec))
                if slice_sec <= 2.0 or core_mask.sum() >= base.n_active:
                    break
                log.info(
                    f"Core search round {core_round + 1}: "
                    f"{int(core_mask.sum())} columns, {slice_sec:.1f}s slice"
                )
                sub = branch_and_bound(
                    model,
                    cfg.replace(
                        bnb=bnb.replace(
                            hard_time_limit_sec=slice_sec,
                            # inherit precompile: the child's own bucket is
                            # the parent's (in-process jit cache, ~0 s) and
                            # its compact grandchild then precompiles the
                            # STANDARD core rung outside the slice budget —
                            # lazily-compiled rungs used to eat the whole
                            # slice (scpnre2 paid 231 s inside a 60 s core
                            # slice, benchmark CSV r3/r4)
                            checkpoint_path="",
                            mesh_devices=0,
                            lagrangian_budget_sec=min(
                                2.0, bnb.lagrangian_budget_sec
                            ),
                        ),
                    ),
                    log,
                    mesh=None,
                    restrict_active=core_mask,
                    warm_incumbent=(best_solution, best_obj),
                    _pool=pool,
                )
                improved = False
                if (
                    np.isfinite(sub.objective)
                    and sub.objective < best_obj - px_tol
                    and len(sub.solution)
                ):
                    xs = (np.asarray(sub.solution)[:n_input] > 0.5).astype(
                        np.float64
                    )
                    if base.is_cover(xs):
                        log.info(
                            f"Core search improved incumbent: {best_obj:.12g} "
                            f"-> {float(base.costs @ xs):.12g}"
                        )
                        adopt(xs, "core_search", float(base.costs @ xs))
                        reduce_by_incumbent()
                        incumbent_budget_pruning(
                            base,
                            best_obj,
                            px_tol,
                            host_budget(cfg.preprocess_time_limit_sec),
                        )
                        solver.refresh()
                        improved = True
                if improved:
                    continue  # refreshed support: next round digs deeper
                if widened:
                    break  # a widened core also failed: stop
                core_mult *= 2
                widened = True

    # ---- main loop ----
    root.parent_dual_bound = global_lower if np.isfinite(global_lower) else -np.inf
    root.parent_dual_bound_raw = (
        global_lower_raw if np.isfinite(global_lower_raw) else -np.inf
    )
    frontier: deque = deque([root])

    processed = 0
    total_lp_iters = 0
    tree_cuts = 0
    tree_cut_rounds = 0
    # feasible nodes whose LP failed numerically: pruned from the search
    # (reference behavior) but their bounds cap the final claim — we never
    # report OPTIMAL over an unexplored feasible subtree
    numerical_failures: List[BranchNode] = []
    # timed-out exact-closure bookkeeping: face size / incumbent at the last
    # inconclusive attempt, attempt count (budget doubles per attempt), the
    # attempt's end time and budget (retries are amortized to <= 1/3 of
    # tree time even without face progress — scp46-class plateaus explode
    # the frontier without ever shrinking the face, so a single fixed-budget
    # attempt used to be the only one the whole run got)
    _closure_inconclusive = None  # dict(n, obj, attempts, t_end, budget)
    # background closure worker (installed just before the main loop; the
    # pre-loop root closure attempt stays inline — the device is idle then
    # and its refutations inform the compact re-solve's warm_lower)
    aclosure: Optional[_AsyncClosure] = None

    # ---- checkpoint resume ----
    ckpt = _load_checkpoint(bnb.checkpoint_path, log) if bnb.checkpoint_path else None
    if ckpt is not None:
        frontier = deque(ckpt["frontier"])
        processed = ckpt["processed"]
        total_lp_iters = ckpt["total_lp_iters"]
        global_lower = ckpt["global_lower"]
        global_lower_raw = ckpt["global_lower_raw"]
        base.active[:] = ckpt["active"]
        base.cuts = ckpt["cuts"]
        root_cuts = ckpt["root_cuts"]
        solver.refresh()
        if np.isfinite(ckpt["best_obj"]) and ckpt["best_obj"] < best_obj:
            best_obj = ckpt["best_obj"]
            best_solution = ckpt["best_solution"]
            incumbent_source = ckpt["incumbent_source"]
    next_ckpt = time.monotonic() + bnb.checkpoint_interval_sec

    def save_checkpoint():
        # strip warm-start iterates: they are a per-session cache, and
        # pickling them would multiply the snapshot size
        stripped = []
        for n in frontier:
            m2 = BranchNode(
                decisions=list(n.decisions),
                depth=n.depth,
                parent_dual_bound=n.parent_dual_bound,
                parent_dual_bound_raw=n.parent_dual_bound_raw,
            )
            stripped.append(m2)
        _save_checkpoint(
            bnb.checkpoint_path,
            {
                "frontier": stripped,
                "processed": processed,
                "total_lp_iters": total_lp_iters,
                "global_lower": global_lower,
                "global_lower_raw": global_lower_raw,
                "active": base.active.copy(),
                "cuts": list(base.cuts),
                "root_cuts": root_cuts,
                "best_obj": best_obj,
                "best_solution": best_solution,
                "incumbent_source": incumbent_source,
            },
            log,
        )
    gap_tolerance_reached = False
    hard_limit = _hard0
    hard_limit_reached = False
    next_log = time.monotonic() + bnb.log_interval_sec

    full_opts = ipm_opts.replace(
        gap_stall_window=bnb.gap_stall_branch_iters,
        gap_stall_min_improv=bnb.gap_stall_min_improv_pct / 100.0,
    )
    # gap-stagnation throttling reuses full_opts with a lower traced
    # iteration cap (total_iters) — same compiled executable
    reduced_iters = max(5, ipm_opts.max_iter // 3)
    iterations_reduced = False
    best_mip_gap_seen = np.inf
    node_at_last_improvement = 0
    # once the gap stagnates, periodically re-run the reduced-root refresh
    # (which chains into the escalating exact face closure): on scp46-class
    # plateaus the tree grinds thousands of unbounded nodes while the 126-
    # column face is one long-enough enumeration away from a proof
    next_closure_try = 0.0

    # pseudocost statistics: per-variable, per-direction running sums of
    # (child LP bound - parent bound) / rounding distance.  Batched node
    # windows make the bookkeeping free; the selector combines both
    # directions with the classic product score (uninitialized variables
    # fall back to the global mean, most-fractional as the tiebreak).
    psc_sum = np.zeros((2, base.ncols))
    psc_cnt = np.zeros((2, base.ncols))

    def note_pseudocost(node: BranchNode, node_bound: float):
        if not node.decisions or node.branch_frac < 0.0:
            return
        d = node.decisions[-1]
        dist = node.branch_frac if d.value == 0 else 1.0 - node.branch_frac
        if dist <= 1e-9 or not np.isfinite(node.parent_dual_bound_raw):
            return
        gain = max(0.0, node_bound - node.parent_dual_bound_raw)
        psc_sum[d.value, d.var] += gain / dist
        psc_cnt[d.value, d.var] += 1.0

    def pseudocost_pick(x, cands: np.ndarray) -> int:
        f = np.clip(np.asarray(x)[cands], 0.0, 1.0)
        ests = []
        for v, dist in ((0, f), (1, 1.0 - f)):
            cnt = psc_cnt[v, cands]
            tot = psc_cnt[v].sum()
            glob = psc_sum[v].sum() / tot if tot > 0 else 1e-6
            mean = np.where(
                cnt > 0,
                psc_sum[v, cands] / np.maximum(cnt, 1.0),
                max(glob, 1e-6),
            )
            ests.append(mean * dist)
        score = np.maximum(ests[0], 1e-9) * np.maximum(ests[1], 1e-9)
        # most-fractional tiebreak keeps early (statistics-free) picks sane
        score = score * (1.0 + 0.01 * np.minimum(f, 1.0 - f))
        return int(cands[int(np.argmax(score))])

    sb_opts = ipm_opts.replace(max_iter=12, tol_gap=1e-5, tol_feas=1e-6)

    def strong_branch_variable(node: BranchNode, res, cands: np.ndarray) -> int:
        """Batched strong branching: solve BOTH children of the top-K most
        fractional candidates as one batched LP call (cheap on the shared-
        matrix solver) and pick the variable maximizing the worse child
        bound.  A TPU-native capability the one-LP-at-a-time reference
        cannot afford."""
        frac = np.abs(res["x"][cands] - 0.5)
        top = cands[np.argsort(frac, kind="stable")[: bnb.strong_branch_cands]]
        children = []
        for v in top:
            for val in (0, 1):
                ch = node.child(int(v), val)
                children.append(ch)
                if ch is not None:
                    ch.warm = res.get("warm")
        if any(c is None for c in children) or not children:
            return -1
        results = solver.solve_nodes(children, sb_opts, deadline)
        best_var, best_score = -1, -np.inf
        for i, v in enumerate(top):
            b0, b1 = results[2 * i], results[2 * i + 1]

            def bound(r):
                if r["status"] == IpmStatus.INFEASIBLE_OR_NUMERICAL:
                    return np.inf  # child pruned outright
                return r["dobj"] if np.isfinite(r["dobj"]) else -np.inf

            score = min(bound(b0), bound(b1))
            if score > best_score:
                best_score, best_var = score, int(v)
        return best_var

    def frontier_lower():
        open_nodes = list(frontier) + [
            n
            for n in numerical_failures
            if n.parent_dual_bound < best_obj - px_tol
        ]
        lows = [n.parent_dual_bound for n in open_nodes]
        raws = [n.parent_dual_bound_raw for n in open_nodes]
        lo = min(lows) if lows else np.inf
        raw = min(raws) if raws else np.inf
        return lo, raw

    def prune_frontier():
        nonlocal frontier
        before = len(frontier)
        frontier = deque(
            n for n in frontier if n.parent_dual_bound < best_obj - px_tol
        )
        if len(frontier) < before:
            log.info(f"Frontier pruned: {before} -> {len(frontier)} nodes")

    def drop_masked_nodes():
        nonlocal frontier
        keep = deque()
        for n in frontier:
            if all(base.active[d.var] or d.value == 0 for d in n.decisions):
                keep.append(n)
        frontier = keep

    def apply_root_floor(res) -> bool:
        """Floor every frontier node with a reduced-root LP bound: every
        open node is that root plus fixings, so its bound floors the whole
        frontier.  Returns True when the bound was usable."""
        nonlocal global_lower, global_lower_raw
        ok = (
            res["status"] == IpmStatus.CONVERGED
            and np.isfinite(res["dobj"])
            and res["dobj"] <= res["pobj"] + 1e-6
        )
        if not ok:
            return False
        new_root_raw = res["dobj"]
        new_root = (
            tighten_dual_bound(new_root_raw, int_tol)
            if obj_is_integral
            else new_root_raw
        )
        floored = 0
        for n in frontier:
            if n.parent_dual_bound < new_root:
                n.parent_dual_bound = new_root
                n.parent_dual_bound_raw = max(
                    n.parent_dual_bound_raw, new_root_raw
                )
                floored += 1
        global_lower = (
            max(global_lower, new_root) if np.isfinite(global_lower) else new_root
        )
        global_lower_raw = (
            max(global_lower_raw, new_root_raw)
            if np.isfinite(global_lower_raw)
            else new_root_raw
        )
        log.info(
            f"Reduced-root LP bound {new_root_raw:.6g} -> floor "
            f"{new_root:.6g} applied to {floored} frontier nodes"
        )
        prune_frontier()
        return True

    def mid_bnb_reductions(seed_res=None):
        """Mask columns with the improved incumbent; drop nodes fixing a
        masked column to 1 (replaces reference remap_branch_node).  When
        columns were removed, re-solve the ROOT LP of the reduced model
        and floor the frontier with its bound, then iterate reduced-cost
        fixing against each re-solve until it stops masking — an improved
        incumbent can close the tree on the spot instead of grinding
        through plateau subtrees."""
        nonlocal frontier
        r = reduce_by_incumbent()
        r += incumbent_budget_pruning(
            base, best_obj, px_tol, host_budget(cfg.preprocess_time_limit_sec)
        )
        if seed_res is not None:
            r += reduced_cost_fix(seed_res)
        if r == 0:
            return
        log.info(f"Mid-BnB reduction: {r} cols masked, {base.n_active} active")
        refresh_root_bound()

    def refresh_root_bound():
        """Re-solve the reduced-model root LP, floor the frontier with its
        bound, and iterate reduced-cost fixing until a fixpoint.  Called
        after incumbent-driven reductions AND after in-tree cuts land:
        new cuts raise the root bound, which unlocks further fixing —
        without this, a plateau's bound froze at the first fixpoint."""
        nonlocal frontier
        for _ in range(8):  # fix -> re-solve -> fix until a fixpoint
            solver.refresh()
            drop_masked_nodes()
            if time_up():
                return
            res = solve_single(BranchNode())
            note_closure_seed(res)
            if res["status"] == IpmStatus.INFEASIBLE_OR_NUMERICAL:
                if node_coverable(None):
                    return  # numerical failure; keep searching as-is
                # reduced model genuinely infeasible = no solution strictly
                # better than the incumbent exists; the search is over
                log.info("Reduced-root LP infeasible: incumbent is optimal")
                frontier.clear()
                numerical_failures.clear()
                return
            apply_root_floor(res)
            if not frontier and processed > 0:
                return  # tree closed by the floor
            r2 = reduced_cost_fix(res)
            if r2 == 0:
                break
            log.info(
                f"Reduced-cost fixing: {r2} cols masked, {base.n_active} active"
            )
        if aclosure is None:
            # no background worker: finish with the inline (blocking)
            # escalating closure sessions
            try_exact_closure(
                seed_x=res["x"] if res is not None else None,
                seed_y=res["y"] if res is not None else None,
            )

    def lift_bound_to(new_lower: float):
        """A face refutation at budget b proves NO improving solution of
        cost <= b exists globally (the maskings preserve an improving
        witness inside the face), so every open subtree's bound lifts to
        b+1 — frontier nodes AND recorded numerical failures alike."""
        nonlocal global_lower, global_lower_raw
        global_lower = max(global_lower, new_lower) if np.isfinite(global_lower) else new_lower
        global_lower_raw = (
            max(global_lower_raw, new_lower)
            if np.isfinite(global_lower_raw)
            else new_lower
        )
        for nd in list(frontier) + numerical_failures:
            nd.parent_dual_bound = max(nd.parent_dual_bound, new_lower)
            nd.parent_dual_bound_raw = max(nd.parent_dual_bound_raw, new_lower)

    def try_exact_closure(seed_x=None, seed_y=None) -> bool:
        """When the improving-preserving reductions have shrunk the active
        set to a small LP-optimal face, finish the search EXACTLY with a
        host-side implicit enumeration (presolve.exact_small_cover) by
        BOTTOM-UP budget probing: starting at the proven dual bound b,
        refute "a cover of cost <= b exists" and raise b one unit at a
        time until either b reaches incumbent-1 (incumbent optimal) or a
        cover IS found at cost b (that cover is optimal: cost == the
        proven bound).  Tight budgets prune the DFS exponentially harder
        than the top-down incumbent-1 budget (scp52's 216-column face:
        refute 300 in 0.1 s, refute 301 in 0.5 s, find 302 in 1.9 s vs
        69 s for the top-down find), and every refutation PERSISTS in
        global_lower — a timed-out probing session resumes where it left
        off instead of restarting.  A refutation is globally valid (the
        masked columns were removed by improving-solution-preserving
        arguments), so it also lifts recorded numerical-failure bounds.
        Returns True when the search was closed."""
        nonlocal frontier, _closure_inconclusive
        if not (bnb.exact_closure and obj_is_integral and np.isfinite(best_obj)):
            return False
        from sypha_tpu.milp.presolve import exact_small_cover, sample_cover

        # always probe with the best covering-row duals seen (post-cut LP
        # duals concentrate on cut rows, leaving the dual-ascent engine
        # with a zero seed — see note_closure_seed)
        if closure_seed["mass"] > 1e-9:
            seed_y = closure_seed["y"]

        # with near-optimal coverage-row duals the native engine's
        # Lagrangian bound refutes plateau faces at many hundreds of
        # columns; without duals only the weak spread bounds apply
        reach = 1024 if seed_y is not None else 384
        while base.n_active <= reach and not time_up():
            # FIND side: LP-guided randomized rounding on the face (cheap
            # and reliable where the exponential enumeration times out)
            if seed_x is not None:
                found = sample_cover(
                    base, seed_x, best_obj - 1.0 + int_tol,
                    time_limit_sec=host_budget(2.0),
                )
                if found is not None:
                    obj_f = float(base.costs @ (found > 0.5))
                    log.info(f"Face sampling found a cover: {obj_f:.12g}")
                    adopt(found, "face_sampling", obj_f)
                    prune_frontier()
                    reduce_by_incumbent()
                    continue
            session_budget = 8.0
            if _closure_inconclusive is not None and seed_y is not None:
                # a dual-armed session already timed out: retry when the
                # face shrank 10% / the incumbent improved / the probe
                # level advanced, OR after enough tree time has passed to
                # amortize a DOUBLED session.  The wait scales with tree
                # productivity: while the tree moves bounds/incumbents the
                # closure stays <= 1/3 of wall time, but once the tree
                # stalls (plateau regime: closure is the only productive
                # phase) the wait shrinks to 1/2 session and closure gets
                # ~2/3 of the clock.
                st = _closure_inconclusive
                progressed = (
                    base.n_active <= 0.9 * st["n"]
                    or best_obj < st["obj"]
                    or (np.isfinite(global_lower) and global_lower > st.get("probe", -np.inf))
                )
                session_budget = min(8.0 * (2.0 ** st["attempts"]), 120.0)
                tree_idle = (
                    best_obj >= st["obj"] - px_tol
                    and (
                        not np.isfinite(global_lower)
                        or global_lower <= st.get("glb_end", -np.inf) + px_tol
                    )
                )
                wait_factor = 0.5 if tree_idle else 2.0
                waited = (
                    time.monotonic() - st["t_end"]
                    >= wait_factor * session_budget
                )
                if not (progressed or waited):
                    return False
            session_budget = host_budget(session_budget)
            t_session_end = time.monotonic() + session_budget
            # bottom-up probe start: the proven (ceil-tightened) bound;
            # fall back to the top-down incumbent-1 budget when no finite
            # bound exists (root LP failed)
            probe = (
                float(np.round(global_lower))
                if np.isfinite(global_lower)
                else best_obj - 1.0
            )
            verdict = None
            last_refute_sec = 0.0
            while probe <= best_obj - 1.0 + int_tol:
                slice_sec = t_session_end - time.monotonic()
                if slice_sec <= 0.05:
                    verdict = None
                    break
                # predictive early stop: refutation cost grows ~5-10x per
                # probe unit; starting a probe that cannot finish inside
                # the session burns its whole slice for nothing (the DFS
                # is stateless across sessions).  Stop early, let the
                # session ladder grow, retry when a session is big enough.
                # At the ladder cap, attempt regardless — the prediction
                # is a heuristic, not a proof.
                if (
                    last_refute_sec > 0.0
                    and 5.0 * last_refute_sec > slice_sec
                    and session_budget < 119.0
                ):
                    verdict = None
                    break
                t_probe = time.monotonic()
                verdict, x = exact_small_cover(
                    base,
                    probe + int_tol,
                    time_limit_sec=slice_sec,
                    duals=seed_y,
                    cuts=closure_cuts(),
                )
                if verdict is None:
                    break
                if verdict is False:
                    last_refute_sec = time.monotonic() - t_probe
                    lift_bound_to(min(probe + 1.0, best_obj))
                    log.info(
                        f"Face probe refuted cost <= {probe:.6g} over "
                        f"{base.n_active} active columns: dual bound -> "
                        f"{min(probe + 1.0, best_obj):.6g}"
                    )
                    probe += 1.0
                    continue
                obj = float(base.costs @ (x > 0.5))
                log.info(
                    f"Face probe found a cover at the proven bound: "
                    f"{obj:.12g}"
                )
                adopt(x, "exact_face_enumeration", obj)
                if obj <= global_lower + px_tol:
                    # cost == proven dual bound: optimal
                    frontier.clear()
                    numerical_failures.clear()
                    return True
                prune_frontier()
                reduce_by_incumbent()
                break  # face changed: restart the outer loop
            else:
                # refuted everything below the incumbent: optimal
                log.info(
                    f"Face probing refuted every cost <= {best_obj - 1.0:.6g} "
                    f"among {base.n_active} active columns — incumbent is "
                    f"optimal"
                )
                frontier.clear()
                numerical_failures.clear()
                return True
            if verdict is None:
                prev_attempts = (
                    _closure_inconclusive["attempts"]
                    if _closure_inconclusive is not None
                    else 0
                )
                # pincer: the bottom-up ladder stalled below incumbent-1.
                # Spend an equal slice probing TOP-DOWN at incumbent-1 —
                # REFUTED closes the search outright (incumbent optimal),
                # FOUND improves the incumbent; the goal-directed find is
                # often far easier than the stalled mid-ladder refutation
                # (scpnre3: find 27 in 49 s while refute 26 needs > 120 s).
                st0 = _closure_inconclusive
                find_stale = (
                    st0 is None
                    or st0.get("find_obj") != best_obj
                    or st0.get("find_budget", 0.0) < session_budget - 1e-9
                )
                find_budget_used = (
                    st0.get("find_budget", 0.0) if st0 is not None else 0.0
                )
                if (
                    probe < best_obj - 1.0 - px_tol
                    and find_stale
                    and not time_up()
                ):
                    fslice = host_budget(session_budget)
                    if fslice > 1.0:
                        fv, fx = exact_small_cover(
                            base,
                            best_obj - 1.0 + int_tol,
                            time_limit_sec=fslice,
                            duals=seed_y,
                            cuts=closure_cuts(),
                        )
                        find_budget_used = max(find_budget_used, fslice)
                        if fv is False:
                            log.info(
                                f"Top-down face probe refuted every cost <= "
                                f"{best_obj - 1.0:.6g} among {base.n_active} "
                                f"active columns — incumbent is optimal"
                            )
                            lift_bound_to(best_obj)
                            frontier.clear()
                            numerical_failures.clear()
                            return True
                        if fv is True:
                            obj_f = float(base.costs @ (fx > 0.5))
                            log.info(
                                f"Top-down face probe found an improving "
                                f"cover: {obj_f:.12g}"
                            )
                            adopt(fx, "exact_face_enumeration", obj_f)
                            prune_frontier()
                            reduce_by_incumbent()
                            continue  # face changed: restart the outer loop
                log.debug(
                    f"Face probing inconclusive at {base.n_active} active "
                    f"cols, probe {probe:.6g} ({session_budget:.0f}s session)"
                )
                _closure_inconclusive = dict(
                    n=base.n_active,
                    obj=best_obj,
                    attempts=prev_attempts + 1,
                    t_end=time.monotonic(),
                    budget=session_budget,
                    probe=probe,
                    glb_end=global_lower,
                    find_obj=best_obj,
                    find_budget=find_budget_used,
                )
                return False
        return False

    # ---- background closure worker ----
    # Installed BEFORE the root closure attempt: with the worker
    # available, refresh_root_bound skips its inline (blocking)
    # sessions entirely and the ladder runs beside the root phases,
    # the compact rebase, and every node window.
    if bnb.exact_closure and bnb.async_closure and obj_is_integral:
        from sypha_tpu import native as _native

        if _native.get_lib() is not None:
            # adopt the early (pre-precompile) worker when one is running —
            # its queued refutations drain at the first async_closure_step
            aclosure = early_closure or _AsyncClosure(base, int_tol, log)
    _closure_attempts: dict = {}
    _last_refute_sec = 0.0

    def async_closure_step(
        start_new: bool = True, first_slice_cap: Optional[float] = None
    ) -> bool:
        """Drain finished ladder slices, apply their verdicts, and (re)arm
        the self-chaining worker.  Returns True when a slice CLOSED the
        search (frontier cleared) — the caller's gap check then declares
        optimal.

        The worker owns the ladder policy (bottom-up refutations with
        growing slices, the pincer find, the all-in final proof); this
        side only applies results and feeds the live ceiling/floor back."""
        nonlocal _closure_attempts, _last_refute_sec
        closed = False
        for r in aclosure.poll_all():
            if r.get("err"):
                log.warn(f"async closure session failed: {r['err']}")
                continue
            v, x, sec, level = r["verdict"], r["x"], r["sec"], r["level"]
            if v is False:
                if r["kind"] == "find":
                    log.info(
                        f"Async probe refuted every cost <= {level:.6g} over "
                        f"{base.n_active} active columns ({sec:.1f}s) — "
                        f"incumbent is optimal"
                    )
                    lift_bound_to(best_obj)
                    frontier.clear()
                    numerical_failures.clear()
                    closed = True
                    continue
                _last_refute_sec = sec
                lifted = min(level + 1.0, best_obj)
                log.info(
                    f"Async face probe refuted cost <= {level:.6g} over "
                    f"{base.n_active} active columns ({sec:.1f}s): dual "
                    f"bound -> {lifted:.6g}"
                )
                lift_bound_to(lifted)
            elif v is True:
                obj_f = float(base.costs @ (x > 0.5))
                if obj_f < best_obj - px_tol:
                    log.info(f"Async face probe found a cover: {obj_f:.12g}")
                    adopt(x, "exact_face_enumeration", obj_f)
                    prune_frontier()
                    if reduce_by_incumbent():
                        solver.refresh()
                    _closure_attempts = {}
        if closed:
            aclosure.stop()
            return True
        # feed the live incumbent ceiling / proven floor to the worker
        aclosure.update(
            best_obj, global_lower if np.isfinite(global_lower) else -np.inf
        )
        if (
            not start_new
            or aclosure.busy()
            or not np.isfinite(best_obj)
            or closure_seed["mass"] <= 1e-9
            or base.n_active > 1024
            or time_up()
        ):
            return False
        probe = (
            float(np.round(global_lower))
            if np.isfinite(global_lower)
            else best_obj - 1.0
        )
        if probe > best_obj - 1.0 + int_tol:
            return False  # nothing below the incumbent left to refute
        remaining = (
            deadline - time.monotonic() if np.isfinite(deadline) else 600.0
        )
        if remaining < 2.0:
            return False
        aclosure.start_ladder(
            probe,
            best_obj,
            lambda: (closure_seed["y"], closure_cuts()),
            deadline,
            _last_refute_sec,
            _closure_attempts,
            first_slice_cap=first_slice_cap,
        )
        return False

    # Root closure attempt: iterate reduced-cost fixing to a fixpoint and
    # hand the root duals to the exact face enumeration — the Lagrangian
    # bound refutes budget incumbent-1 directly on scp4x/5x-class models
    # (scp48: 4 s on the FULL 1000-column model), often closing the search
    # before any branching.  Skipped when the root LP already closed the
    # gap (the main loop's first check then declares optimal immediately).
    if not gap_closed():
        refresh_root_bound()
        if aclosure is not None and not time_up():
            # cap the first slice: the compact-rebase decision right below
            # may hand the search to a child solve, and a stale parent
            # slice competes with the child for the (single) host core
            async_closure_step(first_slice_cap=60.0)

    # ---- compact re-solve (rebase to a smaller padded bucket) ----
    # The improving-preserving reductions above mask columns but the node
    # LPs still solve at the ORIGINAL padded width: every window GEMM pays
    # for columns that can never enter an improving solution (scpnre1:
    # 401/5000 active after the rc-fix fixpoint, ~13x excess FLOPs).  The
    # reference physically removes columns and remaps nodes
    # (rebuildCsrAfterRemoval, src/sypha_node_sparse.cpp:224-282;
    # remap_branch_node, src/sypha_solver_bnb.cpp:300-333); the
    # shape-static TPU analogue is a one-time REBASE: compact the model to
    # (active | incumbent-support) columns and delegate the remaining
    # search to a recursive branch_and_bound on the small bucket.
    # Soundness: any solution strictly better than the incumbent survives
    # the maskings, and the incumbent's own support is carried, so
    # global_optimum = min(best_obj, compact_optimum) and every compact
    # dual bound is a valid global bound; OPTIMAL carries over.  The
    # compact run's own root phase re-fixes against its (improving)
    # incumbents, so the rebase compounds with every later reduction.
    if (
        bnb.compact_resolve
        and _compact_depth < 2
        and restrict_active is None
        and ckpt is None
        and np.isfinite(best_obj)
        and not gap_closed()
        and not time_up()
        and len(frontier) == 1
        and not frontier[0].decisions
    ):
        keep = base.active | (best_solution[:n_input] > 0.5)
        new_n = int(keep.sum())
        old_np = solver._bucket[1] or _round_up(
            base.ncols + base.nrows + _NodeLpSolver.CUT_HEADROOM, 128
        )
        new_np = _std_bucket_cols(
            new_n + base.nrows_cover + _NodeLpSolver.CUT_HEADROOM
        )
        if new_np <= bnb.compact_frac * old_np:
            # harvest any in-flight async refutation first: the child's
            # warm_lower inherits whatever the ladder proved by now (a
            # session still running keeps refining the PARENT base — its
            # result would be globally valid but has no one to report to)
            if aclosure is not None and aclosure.busy():
                aclosure.stop()  # end the ladder after the current slice
                aclosure.join(
                    min(5.0, max(0.0, deadline - time.monotonic()))
                    if np.isfinite(deadline)
                    else 5.0
                )
            if aclosure is not None:
                async_closure_step(start_new=False)
            # the harvest may have CLOSED the search (refuted find /
            # lifted bound to the incumbent): skip the rebase, the
            # main loop's first gap check then returns OPTIMAL
            if frontier and not gap_closed():
                compact_model, cols = _compact_scp(
                    base, keep, f"{model.name}@compact{_compact_depth + 1}"
                )
                remaining = (
                    max(1.0, deadline - time.monotonic())
                    if np.isfinite(deadline)
                    else 0.0
                )
                log.info(
                    f"Compact re-solve: rebasing {new_n}/{n_input} columns "
                    f"(bucket {old_np} -> {new_np}), delegating the search"
                )
                sub = branch_and_bound(
                    compact_model,
                    cfg.replace(
                        bnb=bnb.replace(
                            hard_time_limit_sec=remaining,
                            checkpoint_path="",
                            # snap the child's bucket to the standard rung
                            # so faces of different sizes across a family
                            # sweep share one compiled executable set
                            bucket_cols_floor=new_np,
                        )
                    ),
                    log,
                    mesh=mesh,
                    warm_incumbent=(best_solution[cols], best_obj),
                    warm_lower=(
                        global_lower if np.isfinite(global_lower) else None
                    ),
                    warm_duals=(
                        # covering-row duals survive compaction unchanged
                        # (columns are remapped, rows are not) — they arm
                        # the child's ladder through its precompile window
                        closure_seed["y"]
                        if closure_seed["mass"] > 1e-9
                        else None
                    ),
                    _compact_depth=_compact_depth + 1,
                    _pool=pool,
                )
                obj = best_obj
                x_out = best_solution
                src = incumbent_source
                if np.isfinite(sub.objective) and sub.objective <= best_obj + px_tol:
                    x_out = np.zeros(n_input)
                    x_out[cols[np.flatnonzero(sub.solution > 0.5)]] = 1.0
                    obj = float(base.costs @ x_out)
                    src = sub.incumbent_source
                dual = max(
                    global_lower if np.isfinite(global_lower) else -np.inf,
                    sub.dual_bound,
                )
                optimal = sub.status == MilpStatus.OPTIMAL or (
                    np.isfinite(dual) and compute_mip_gap(obj, dual) <= mip_gap_tol
                )
                return MilpResult(
                    status=MilpStatus.OPTIMAL if optimal else MilpStatus.FEASIBLE,
                    objective=obj,
                    dual_bound=obj if optimal else dual,
                    mip_gap=0.0 if optimal else compute_mip_gap(obj, dual),
                    nodes_processed=sub.nodes_processed,
                    total_lp_iterations=sub.total_lp_iterations,
                    solution=x_out,
                    incumbent_source=src,
                    wall_time_sec=(
                        time.monotonic() - t_start - sub.compile_time_sec
                    ),
                    root_cuts=root_cuts + sub.root_cuts,
                    tree_cuts=sub.tree_cuts,
                    compile_time_sec=compile_total + sub.compile_time_sec,
                )

    # Device-loss resilience: the remote TPU worker can crash mid-sweep
    # (kernel fault, observed repeatedly on 1000x10000 shapes, 2026-08-19/20).
    # The crash poisons every subsequent device call in this process, but
    # the host-side search state (incumbent, frontier bounds, closure
    # refutations) is intact — so instead of losing the whole run, stop
    # dispatching device work and finalize an honest FEASIBLE result.
    # Optimality is still claimable if the gap had already closed.
    device_lost = False
    # endgame time-plateau tracking: when (incumbent, bound) last changed
    _eg_state = (best_obj, global_lower)
    _eg_since = time.monotonic()
    try:
        while processed < bnb.max_nodes:
            now = time.monotonic()
            if (hard_limit > 0 and (now - t_start) >= hard_limit) or log.is_stop_requested():
                hard_limit_reached = True
                log.info("BnB hard time limit reached")
                break
            if solver.device_lost:
                # a window absorbed a device loss (solve_nodes latched the
                # flag and returned a failed window that the status lattice
                # already treated soundly): stop dispatching — every further
                # device call in this process would fail too — and finalize
                # an honest FEASIBLE/NOT_SOLVED from host state.  Also bars
                # the auto_fallback_lp solve below (it would re-raise).
                device_lost = True
                hard_limit_reached = True  # never claim frontier exhaustion
                log.warn("device lost; stopping dispatch, finalizing from host state")
                break
            if bnb.checkpoint_path and now >= next_ckpt:
                save_checkpoint()
                next_ckpt = now + bnb.checkpoint_interval_sec
            if pool.n_processes > 1:
                # multi-host cadence: pool incumbent/dual-bound/stop scalars
                # over DCN once per window round (no-op single-process).  The
                # incumbent *solution* stays on its owning host; a remote
                # objective still prunes our frontier and closes our gap.
                lo, _ = frontier_lower()
                pooled = pool.sync(
                    best_obj,
                    lo if np.isfinite(lo) else global_lower,
                    False,
                    solution=(
                        best_solution if np.isfinite(best_obj) else None
                    ),
                )
                # adopt the pooled incumbent BEFORE honoring a stop flag: a
                # peer that proved optimality departs with stop=True AND the
                # optimal objective in the same round
                if pooled.incumbent < best_obj - px_tol:
                    # the cover bits ship with the objective (BoundPool wire
                    # format), so the (objective, solution) pair stays
                    # consistent; verify cost + cover before trusting the wire
                    sol = pooled.incumbent_solution
                    if sol is not None and sol.shape[0] >= n_input:
                        cand = (sol[:n_input] > 0.5).astype(np.float64)
                        cost = float(base.costs @ cand)
                        if (
                            abs(cost - pooled.incumbent)
                            <= px_tol * max(1.0, abs(cost))
                            and base.is_cover(cand)
                        ):
                            best_solution = cand
                            best_obj = pooled.incumbent
                            incumbent_source = "pooled_remote"
                            log.info(
                                f"Pooled remote incumbent: {best_obj:.12g}"
                            )
                            prune_frontier()
                        else:
                            log.warn(
                                "Pooled incumbent bits failed verification; "
                                "ignoring the remote value"
                            )
                    else:
                        # no bits on the wire (a peer synced without its
                        # cover): keep our own consistent (objective,
                        # solution) pair; the bits arrive on the peer's next
                        # cadence round
                        log.info(
                            f"Pooled remote objective {pooled.incumbent:.12g} "
                            "arrived without cover bits; waiting for them"
                        )
                if pooled.stop:
                    hard_limit_reached = True
                    log.info("Stop flag pooled from a peer process")
                    break
            if aclosure is not None and async_closure_step():
                continue  # search closed; the empty-frontier exit fires next
            if np.isfinite(best_obj) and np.isfinite(global_lower):
                cur_gap = compute_mip_gap(best_obj, global_lower)
                if np.isfinite(cur_gap) and cur_gap <= mip_gap_tol:
                    gap_tolerance_reached = True
                    log.info(
                        f"MIP gap {cur_gap * 100:.6f}% within LP tolerance; declaring optimal"
                    )
                    break
            # ---- endgame: give the final proof the whole host core ----
            # One integer unit of gap + a plateaued frontier + the ladder
            # grinding the final refutation (refute best_obj-1 == the
            # optimality proof): tree windows only steal host cycles from the
            # one mechanism that can end the run.  Measured scpnre3: 2175
            # nodes / 36k lp_iters of ZERO bound progress ran beside a final
            # refute that needs 156 s dedicated — and starved it past the
            # budget.  Idle the device, poll the worker, re-check the clock.
            if (best_obj, global_lower) != _eg_state:
                _eg_state = (best_obj, global_lower)
                _eg_since = now
            if (
                aclosure is not None
                and aclosure.busy()
                and obj_is_integral
                and np.isfinite(best_obj)
                and np.isfinite(global_lower)
                and best_obj - global_lower <= 1.0 + int_tol
                and (
                    len(frontier) >= bnb.endgame_frontier > 0
                    # time-plateau trigger: windows ramp 1,2,4,... so the
                    # frontier-size gate can arm a minute into the final
                    # refute; a gap this small with zero progress for
                    # endgame_stall_sec is the same plateau signal
                    or (
                        bnb.endgame_stall_sec > 0
                        and now - _eg_since >= bnb.endgame_stall_sec
                    )
                )
            ):
                time.sleep(0.2)  # releases the GIL; the DFS owns the core
                continue
            if iterations_reduced and now >= next_closure_try:
                refresh_root_bound()
                st = _closure_inconclusive
                next_closure_try = time.monotonic() + max(
                    10.0, 2.0 * st["budget"] if st is not None else 0.0
                )
                if not frontier:
                    continue  # closed by the refresh/closure chain
            if bnb.log_interval_sec > 0 and now >= next_log:
                lo, raw = frontier_lower()
                if np.isfinite(lo):
                    global_lower = lo
                elif not frontier:
                    global_lower = best_obj
                if np.isfinite(raw):
                    global_lower_raw = raw
                elif not frontier:
                    global_lower_raw = best_obj
                g = compute_mip_gap(best_obj, global_lower_raw)
                log.info(
                    f"  nodes={processed:4d} frontier={len(frontier):4d} "
                    f"lp_iters={total_lp_iters:5d} cuts={root_cuts + tree_cuts:4d} "
                    f"incumbent={best_obj:10.6g} dual={global_lower_raw:10.6g} "
                    f"gap={g * 100:.4f}%"
                )
                if log.verbosity >= 4:
                    # device-memory telemetry on the progress cadence (the
                    # reference samples GPU memory around every linear solve,
                    # src/sypha_solver.cpp:209-216, :805-817; per-window
                    # sampling here costs one local runtime call)
                    from sypha_tpu.utils.telemetry import device_memory_stats

                    mem = device_memory_stats()
                    if mem is not None:
                        log.debug(f"  device memory: {mem}")
                next_log = now + bnb.log_interval_sec

            # pop a batch of live nodes, best-bound-first with deeper nodes
            # breaking ties (the window solves as one real batch, so taking the
            # lowest parent bounds tightens the global bound fastest while the
            # depth tie-break keeps a diving flavor for incumbents; the
            # reference processes its window one node at a time, DFS-ish)
            frontier = deque(
                sorted(frontier, key=lambda n: (n.parent_dual_bound, -n.depth))
            )
            batch: List[BranchNode] = []
            while frontier and len(batch) < bnb.node_batch:
                n = frontier.popleft()
                if n.parent_dual_bound >= best_obj - px_tol:
                    continue
                if any(d.value == 1 and not base.active[d.var] for d in n.decisions):
                    continue  # fixed-to-1 on masked column => infeasible node
                batch.append(n)
            if not batch:
                if not frontier:
                    break
                continue

            results = solver.solve_nodes(
                batch,
                full_opts,
                deadline,
                total_iters=reduced_iters if iterations_reduced else None,
            )
            tree_cut_cands = []

            for node_i, (node, res) in enumerate(zip(batch, results)):
                if node_i > 0 and time_up():
                    # the hard limit fired mid-window (host phases per node can
                    # be expensive); re-queue the unprocessed nodes with their
                    # parent bounds intact and stop
                    frontier.extend(batch[node_i:])
                    break
                if res["status"] == IpmStatus.INFEASIBLE_OR_NUMERICAL:
                    if node_coverable(node):
                        # the node LP is actually feasible: the failure is
                        # numerical.  The reference prunes failed non-root
                        # nodes and continues (src/sypha_solver_bnb_driver.cpp:
                        # 844-859); we do the same but keep the node's parent
                        # bound alive in the global bound via bookkeeping.
                        log.warn(
                            f"node LP numerical failure (depth {node.depth}); "
                            "pruning node, bound unchanged"
                        )
                        numerical_failures.append(node)
                        continue
                    # genuinely infeasible node (fixings/maskings kill a row):
                    # prune; an infeasible *root* with an incumbent means
                    # presolve proved the incumbent optimal.  Only abort when
                    # there is no incumbent either.
                    if processed == 0 and not np.isfinite(best_obj):
                        log.info("Root LP infeasible or numerically unstable; aborting BnB")
                        return MilpResult(
                            status=MilpStatus.ABNORMAL,
                            objective=np.inf,
                            dual_bound=np.inf,
                            mip_gap=np.inf,
                            nodes_processed=processed,
                            total_lp_iterations=total_lp_iters,
                            wall_time_sec=time.monotonic() - t_start,
                            compile_time_sec=compile_total,
                        )
                    continue

                processed += 1
                total_lp_iters += res["iterations"]
                sane = (
                    np.isfinite(res["dobj"])
                    and np.isfinite(res["pobj"])
                    and res["dobj"] <= res["pobj"] + 1e-6
                )
                reliable = sane and res["status"] == IpmStatus.CONVERGED
                # weak duality: any (near-)dual-feasible iterate's objective is a
                # valid lower bound even without full convergence — stalled or
                # iteration-capped node LPs (common with warm starts + the
                # gap-stall window) can still tighten bounds, with a small
                # slack for the residual dual infeasibility.
                weak_ok = (
                    not reliable
                    and sane
                    and res["status"] in (IpmStatus.GAP_STALLED, IpmStatus.MAX_ITER)
                    and res["res_d"] <= 1e-7
                )
                if weak_ok:
                    slack = max(1e-9, 1e-7 * abs(res["dobj"]))
                    node_bound = res["dobj"] - slack
                    reliable = True
                elif reliable:
                    node_bound = res["dobj"]
                if reliable:
                    note_pseudocost(node, node_bound)
                # bounds are monotone down a subtree: never regress below parent
                node_dual_raw = (
                    max(node_bound, node.parent_dual_bound_raw)
                    if reliable
                    else node.parent_dual_bound_raw
                )
                node_dual = (
                    max(node_bound, node.parent_dual_bound)
                    if reliable
                    else node.parent_dual_bound
                )
                if obj_is_integral and reliable and np.isfinite(node_dual):
                    node_dual = tighten_dual_bound(node_dual, int_tol)
                dual_improved = reliable and (
                    node_dual > node.parent_dual_bound + px_tol
                )

                run_h = (
                    processed == 1
                    or (
                        bnb.heuristic_every_n_nodes > 0
                        and processed % bnb.heuristic_every_n_nodes == 0
                    )
                    or dual_improved
                )
                # cheap 2-threshold repair per node; full sweep every 16th
                if run_h and try_heuristics(res, node, thorough=(processed % 16 == 1)):
                    node_at_last_improvement = processed
                    prune_frontier()
                    mid_bnb_reductions()

                if node_dual >= best_obj - px_tol:
                    continue

                # --- terminal / branch decision.  Every node must end in one
                # of: bound-prune (above), exact close (CONVERGED integral
                # LP), branch, or an EXPLICIT numerical-failure record that
                # caps optimality claims.  A silent close is unsound: a lane
                # that stalls on an integral-but-not-better iterate has
                # neither solved nor bounded its subtree (this once "proved"
                # 495 on scp44 whose optimum is 494).  Unbranchable nodes get
                # one rescue re-solve at full accuracy (no stall window)
                # before being declared failures. ---
                var = -1
                for attempt in (0, 1):
                    if integral_cover(res):
                        if res["pobj"] < best_obj - px_tol:
                            x_int = np.clip(np.floor(res["x"] + 0.5), 0, 1)
                            adopt(x_int, "exact_node", float(base.costs @ x_int))
                            node_at_last_improvement = processed
                            log.info(f"New incumbent from node LP: {best_obj:.12g}")
                            prune_frontier()
                            mid_bnb_reductions()
                        if res["status"] == IpmStatus.CONVERGED:
                            # the node's LP optimum is integral: subtree solved
                            var = -2
                            break
                    cands = fractional_candidates(res["x"], base.ncols, int_tol)
                    cands = cands[base.active[cands]]
                    if len(cands):
                        # candidate for in-tree cut separation (below, after
                        # the window): bound-improving nodes first, but
                        # plateau nodes — whose LP re-finds the SAME stuck
                        # bound — are exactly where new cuts must come from
                        if dual_improved:
                            tree_cut_cands.insert(0, res)
                        else:
                            tree_cut_cands.append(res)
                        if (
                            bnb.strong_branch_depth > 0
                            and node.depth <= bnb.strong_branch_depth
                            and len(cands) > 1
                        ):
                            var = strong_branch_variable(node, res, cands)
                        if var < 0:
                            if bnb.var_selection == "pseudocost":
                                var = pseudocost_pick(res["x"], cands)
                            else:
                                var = select_branch_variable(
                                    bnb.var_selection, res["x"], base.costs, cands
                                )
                    if var >= 0 or attempt == 1:
                        break
                    log.debug(
                        f"rescue re-solve of unbranchable node (depth {node.depth})"
                    )
                    res = solver.solve_nodes([node], ipm_opts, deadline)[0]
                    total_lp_iters += res["iterations"]
                    if usable_bound(res):
                        rb = res["dobj"]
                        if res["status"] != IpmStatus.CONVERGED:
                            rb -= max(1e-9, 1e-7 * abs(rb))
                        node_dual_raw = max(node_dual_raw, rb)
                        nd = max(node.parent_dual_bound, rb)
                        if obj_is_integral:
                            nd = tighten_dual_bound(nd, int_tol)
                        node_dual = max(node_dual, nd)
                if var == -2 or node_dual >= best_obj - px_tol:
                    continue
                if var < 0 and not node_coverable(node):
                    # masking/fixings genuinely killed a row: the node LP is
                    # infeasible by construction (e.g. incumbent reductions
                    # masked every improving column) — a sound prune
                    continue
                if var < 0:
                    log.warn(
                        f"node LP unbranchable after rescue (depth {node.depth}, "
                        f"status {res['status'].name}); recording as numerical "
                        "failure — optimality claims stay capped at its bound"
                    )
                    # carry the best justified bound into the failure record so
                    # the final claim is capped as tightly as possible
                    node.parent_dual_bound = max(node.parent_dual_bound, node_dual)
                    node.parent_dual_bound_raw = max(
                        node.parent_dual_bound_raw, node_dual_raw
                    )
                    numerical_failures.append(node)
                    continue
                for value in (0, 1):
                    child = node.child(var, value)
                    if child is not None and child is not node:
                        child.parent_dual_bound = node_dual
                        child.parent_dual_bound_raw = node_dual_raw
                        child.warm = res.get("warm")
                        child.branch_frac = float(
                            np.clip(res["x"][var], 0.0, 1.0)
                        )
                        frontier.append(child)

                # adaptive LP-iteration throttling on MIP-gap stagnation
                if bnb.gap_stagnation_window > 0 and np.isfinite(best_obj):
                    refresh = max(1, bnb.gap_stagnation_window // 5)
                    if processed % refresh == 0:
                        lo, _ = frontier_lower()
                        if np.isfinite(lo):
                            global_lower = lo
                    cur_gap = compute_mip_gap(best_obj, global_lower)
                    if np.isfinite(cur_gap) and cur_gap < best_mip_gap_seen - 1e-8:
                        best_mip_gap_seen = cur_gap
                        node_at_last_improvement = processed
                        if iterations_reduced:
                            iterations_reduced = False
                            log.info(
                                f"MIP gap improved to {cur_gap * 100:.4f}%, restoring LP iterations"
                            )
                    if (
                        not iterations_reduced
                        and processed - node_at_last_improvement
                        >= bnb.gap_stagnation_window
                    ):
                        iterations_reduced = True
                        log.info(
                            f"MIP gap stagnant for {bnb.gap_stagnation_window} nodes, "
                            f"reducing LP iterations"
                        )

            # ---- in-tree cut separation ----
            # Cuts separated from NODE LP points are globally valid here:
            # branch decisions are column fixings, so the rows any CG
            # aggregation touches are always original covering/cut rows
            # (u >= 0 combination + integer rounding is valid for every
            # integer cover).  The reference appends node-local cut rows
            # instead (build_branch_model, src/sypha_solver_bnb.cpp:418-490);
            # appending globally tightens EVERY open subtree at once, which is
            # what plateaued SCP duals need.  Bounded by the padded bucket so
            # no recompile ever triggers.
            if (
                bnb.cuts_enabled
                and bnb.tree_cut_nodes_per_round > 0
                and tree_cut_rounds < bnb.tree_cut_max_rounds
                and tree_cut_cands
            ):
                room = solver.room_for_cuts()
                added = []
                for res_c in tree_cut_cands[: bnb.tree_cut_nodes_per_round]:
                    if len(added) >= room:
                        break
                    cuts = separate_cuts(
                        base, res_c["x"], res_c["y"], int_tol,
                        bnb.max_cuts_per_round,
                        incumbent=best_obj, obj_is_integral=obj_is_integral,
                    )
                    added += fresh_cuts(cuts, room - len(added))
                if added:
                    base.add_cuts(added)
                    tree_cuts += len(added)
                    tree_cut_rounds += 1
                    solver.refresh()
                    log.debug(
                        f"In-tree separation: +{len(added)} cuts "
                        f"(total {tree_cuts}, room {solver.room_for_cuts()})"
                    )
                    # cuts raise the root bound -> refresh the frontier floor
                    # and re-run reduced-cost fixing against it
                    refresh_root_bound()

    except Exception as e:  # noqa: BLE001 — filtered to device loss below
        if not _is_device_loss(e):
            raise
        device_lost = True
        hard_limit_reached = True  # never claim frontier exhaustion
        log.warn(f"device lost mid-search, finalizing from host state: {e}")

    # drain the background closure worker: a refutation that finished
    # while the loop was exiting still lifts the reported bound (and the
    # frontier floors), and a found cover still improves the incumbent
    if aclosure is not None and aclosure.busy():
        aclosure.stop()  # no chaining past the run's end
        aclosure.join(
            min(2.0, max(0.0, deadline - time.monotonic()))
            if np.isfinite(deadline)
            else 2.0
        )
    if aclosure is not None:
        async_closure_step(start_new=False)

    # final checkpoint: a time-limited run can resume where it stopped
    if bnb.checkpoint_path and (hard_limit_reached or frontier):
        save_checkpoint()

    # final bounds; numerically-failed feasible subtrees cap the claim
    open_failures = [
        n for n in numerical_failures if n.parent_dual_bound < best_obj - px_tol
    ]
    lo, raw = frontier_lower()
    if np.isfinite(lo):
        global_lower = lo
    elif not frontier and not open_failures and np.isfinite(best_obj):
        global_lower = best_obj
    elif lo == -np.inf or not np.isfinite(global_lower):
        # open nodes with no established bound (e.g. the root LP never
        # finished inside the time budget): the bound is unknown, -inf —
        # never report the +inf initialisation as a "dual bound"
        global_lower = -np.inf
    if np.isfinite(raw):
        global_lower_raw = raw
    elif not frontier and not open_failures and np.isfinite(best_obj):
        global_lower_raw = best_obj
    elif raw == -np.inf or not np.isfinite(global_lower_raw):
        global_lower_raw = -np.inf

    wall = time.monotonic() - t_start
    log.info(f"BnB processed {processed} nodes, {total_lp_iters} total LP iterations")
    if open_failures:
        log.warn(
            f"{len(open_failures)} feasible nodes lost to numerical LP "
            "failures; optimality cannot be claimed past their bounds"
        )

    if np.isfinite(best_obj):
        # a closed gap is a proof regardless of WHY the loop stopped (e.g.
        # a time limit hit right after the bound closed)
        gap_closed = (
            np.isfinite(global_lower)
            and compute_mip_gap(best_obj, global_lower) <= mip_gap_tol
        )
        proven = not open_failures and (
            gap_closed
            or (
                (not frontier or gap_tolerance_reached)
                and not hard_limit_reached
                and processed < bnb.max_nodes
            )
        )
        if proven:
            status = MilpStatus.OPTIMAL
            dual_bound = best_obj
            gap = 0.0
            if not gap_tolerance_reached:
                log.info("Optimality proven: search frontier exhausted")
        else:
            status = MilpStatus.FEASIBLE
            dual_bound = global_lower
            gap = compute_mip_gap(best_obj, dual_bound)
        return MilpResult(
            status=status,
            objective=best_obj,
            dual_bound=dual_bound,
            mip_gap=gap,
            nodes_processed=processed,
            total_lp_iterations=total_lp_iters,
            solution=best_solution,
            incumbent_source=incumbent_source,
            wall_time_sec=wall,
            root_cuts=root_cuts,
            tree_cuts=tree_cuts,
            compile_time_sec=compile_total,
        )

    log.info("No integer incumbent found within node limit")
    if bnb.auto_fallback_lp and not device_lost and not solver.device_lost:
        # reference --bnb-auto-fallback-lp (src/sypha_solver_bnb_driver.cpp:
        # 1138-1158): degrade MILP -> LP relaxation so the caller still gets
        # bounds + a fractional solution
        log.info("Falling back to LP relaxation solve")
        res = solve_single(BranchNode())
        if res["status"] in (IpmStatus.CONVERGED, IpmStatus.MAX_ITER):
            return MilpResult(
                status=MilpStatus.NOT_SOLVED,
                objective=np.inf,
                dual_bound=res["dobj"],
                mip_gap=np.inf,
                nodes_processed=processed,
                total_lp_iterations=total_lp_iters + res["iterations"],
                solution=np.asarray(res["x"][:n_input]),
                incumbent_source="lp_relaxation_fallback",
                wall_time_sec=time.monotonic() - t_start,
                root_cuts=root_cuts,
                tree_cuts=tree_cuts,
                compile_time_sec=compile_total,
            )
    return MilpResult(
        status=MilpStatus.NOT_SOLVED,
        objective=np.inf,
        dual_bound=global_lower,
        mip_gap=np.inf,
        nodes_processed=processed,
        total_lp_iterations=total_lp_iters,
        incumbent_source="none",
        wall_time_sec=wall,
        root_cuts=root_cuts,
        tree_cuts=tree_cuts,
        compile_time_sec=compile_total,
    )
