"""amgb — the multigrid interior-point (barrier) solver.

Solves the convex variational problem

    min_z  sum_i w_i * c(x_i) . (Dz)_i      (linear cost in Dz)
    s.t.   (Dz)_i in Q  for every quadrature point i   (pointwise convex)
           z - z_g in the conforming (Dirichlet) subspace

by a two-phase interior-point method with multigrid acceleration, matching
the behavioral contract of MultiGridBarrier.amgb reconstructed from the
reference (call stack: SURVEY.md §3.1; log contract:
/root/reference/docs/src/api.md:89-103):

* Phase 1 ("feasibility", SOL_feasibility): an augmented problem with one
  extra slack field e minimizing sum w*e under the relaxed constraint
  until the true constraint is strictly satisfied; skipped (0 iterations)
  when the initial iterate is already strictly feasible.
* Phase 2 ("main", SOL_main): path-following t <- kappa*t; at each t a
  coarse-to-fine sweep of damped Newton iterations over the subspace
  hierarchy (`its` counts per level, reference log field `its`).

TPU-native design notes:
- The iterate z lives in the *broken* quadrature-point space (n, nfields);
  level-l Newton corrections are R_l @ dv, so level transitions are free
  and no inter-level re-basing is needed.
- F1/F2 of the barrier are jax.grad / jax.hessian, vmapped over rows —
  replacing the reference's map_rows F1/F2 pipeline
  (tools/profile_barrier.jl:44-151) with fused XLA code.
- The Newton system R' (D' diag(w.*F2) D) R of the reference
  (test/test_map_rows_compare.jl:102-139) is assembled densely per level as
  one MXU contraction for m <= dense_threshold, and solved matrix-free with
  multigrid-preconditioned CG above (the MUMPS replacement, SURVEY.md §2.4).
- One jitted Newton step per level; static shapes: nothing recompiles or
  re-plans inside the Newton loop (designing out the reference's per-step
  re-hash/re-plan overhead, tools/profile_hash.jl:63-66).
- The reference's `amgb_all_isfinite` Allreduce line-search safety check
  (src/MultiGridBarrierMPI.jl:119-133) is an isfinite() on the jitted
  objective: the barrier evaluates to NaN outside the domain and the
  backtracking loop rejects the step.
"""

from __future__ import annotations

import dataclasses
import math
import os
import sys
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.geometry import Geometry
from .convex import Convex, convex_Euclidian_power
from .linsolve import LevelSystem, dense_solve, mgcg_solve

# ----------------------------------------------------------------------------
# Problem specification
# ----------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DSpec:
    """Static operator-selection table: row j of Dz is operators[op_j]
    applied to field f_j (the reference's D matrix, e.g.
    [:u :id; :u :dx; :u :dy; :s :id], src/MultiGridBarrierMPI.jl:736)."""

    entries: Tuple[Tuple[int, str], ...]  # (field_index, op_name) per row
    fieldnames: Tuple[str, ...]

    @property
    def k(self) -> int:
        return len(self.entries)

    @property
    def nfields(self) -> int:
        return len(self.fieldnames)


def _normalize_D(D) -> DSpec:
    fieldnames: list = []
    entries = []
    for row in D:
        fname, opname = str(row[0]).lstrip(":"), str(row[1]).lstrip(":")
        if fname not in fieldnames:
            fieldnames.append(fname)
        entries.append((fieldnames.index(fname), opname))
    return DSpec(entries=tuple(entries), fieldnames=tuple(fieldnames))


def default_D(dim: int):
    grads = ["dx", "dy", "dz"][:dim]
    return [("u", "id")] + [("u", g) for g in grads] + [("s", "id")]


def default_f(dim: int, dtype):
    vec = np.array([0.5] + [0.0] * dim + [1.0])

    def f(x):
        return jnp.asarray(vec, dtype=dtype)

    return f


def default_g(dim: int, dtype):
    def g(x):
        xs = x[:dim]
        return jnp.stack([jnp.sum(xs * xs), jnp.asarray(100.0, dtype=dtype)])

    return g


_DEFAULT_Q_CACHE: dict = {}
_CO_BARRIER_CACHE: dict = {}


def _nd_cheap_engine() -> str:
    """Cheap-direction engine for the fused gate (MGB_ND_CHEAP):
    'f32' (shifted-f32 factor) or 'df' (pair-f32-base f64 factor).
    Default df on accelerators (the v5e's emulated-f64 base-block ops
    are the factor's cost — probe_df_factor: 608ms -> 186ms at L=7 —
    and q48-quality factors certify with ~0 PCG sweeps through t~1e5);
    f32 on CPU (native f64 there, pair arithmetic is pure overhead)."""
    env = os.environ.get("MGB_ND_CHEAP")
    if env:
        return env
    return "df" if jax.default_backend() != "cpu" else "f32"


def _nd_cheap_delta() -> float:
    """Host-side default diagonal shift for the cheap engine's
    equilibrated factor: the f32 engine needs ~3e-6 (sub-eps32 leaf
    pivots), the df engine ~1e-12 (extends certification past the
    unshifted NaN boundary at t~1e6 with no measurable mid-path
    cost)."""
    if _nd_cheap_engine() == "df":
        # 0: the unshifted df factor certifies with ~0 sweeps wherever
        # it is finite (t <= ~1e5) and NaNs INSTANTLY beyond — the
        # cheapest possible failure (probed: a 1e-13 shift stays finite
        # to t~1e7 but needs 12-17 f64 PCG sweeps there, ~1.5s — more
        # than the f64 factor it would replace)
        return float(os.environ.get("MGB_ND_DF_SHIFT", "0"))
    return float(os.environ.get("MGB_ND_F32_SHIFT", "3e-6"))


def _f32pc_on() -> bool:
    """MGB_ND_F32PC default: ON for accelerator backends, OFF on CPU.

    The shifted-f32-preconditioned certified direction (nd_dir_f32) is
    measured CPU-neutral (session-7: identical objectives/its at L<=6,
    no wall win on LAPACK where the f64 factor is cheap), but on the
    v5e the f64 multifrontal factor is software-emulated at ~12x the
    f32 cost (fem2d L=7 leaf16 relay: 581ms f64 vs 53ms f32), so every
    Newton step the cheap path certifies replaces a 581ms factor with
    a 53ms one plus a few ~60ms PCG sweeps.  Honesty is structural:
    the accepted direction always solves the TRUE f64 system to
    cg_rtol (the certification gate), exactly like the f64 path."""
    env = os.environ.get("MGB_ND_F32PC")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "cpu"


def _nd_pipeline_on() -> bool:
    """MGB_ND_PIPELINE default: ON for accelerator backends, OFF on CPU.

    The fused-gate runner serializes ~43ms of tunnel RTT per Newton
    iteration (dispatch + blocking scalar get, CLAUDE.md session-3); at
    fem2d L=7's ~165 fine its that is ~7s of device idle.  Pipelining
    dispatches iteration k+1 on iteration k's output FUTURES before
    blocking on k's scalars, so the get rides under k+1's device
    execution.  Honesty is unaffected: the attempt policy flags it
    speculates (try_cheap/cap) only steer device-side *performance* —
    every direction is still certified-or-fresh-f64 by the on-device
    gate — and a conservative host stop predictor (speculate only while
    lam2 > 0.25, |dphi| above the floor band, patience/cap headroom)
    avoids wasting a program at stage ends; a mispredicted speculation
    is discarded, never applied.  No program changes: zero new compiles
    on the remote-compile queue.  CPU default OFF: device == host core,
    there is no RTT to hide and the speculative step would contend."""
    env = os.environ.get("MGB_ND_PIPELINE")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "cpu"


def _co_barrier_for(Qset: "Convex", k: int) -> Callable:
    """Memoized phase-1 barrier wrapper for (Qset, k).

    The solver-context cache is keyed on barrier identity; a fresh closure
    per amgb call would make every infeasible-start solve miss the cache
    and recompile all level kernels (the exact cost _get_ctx exists to
    avoid — same memoization rationale as default_Q)."""
    key = (Qset, k)
    fn = _CO_BARRIER_CACHE.get(key)
    if fn is None:

        def fn(xi, ya, _Q=Qset, _k=k):
            return _Q.cobarrier(xi, ya[:_k], ya[_k])

        _CO_BARRIER_CACHE[key] = fn
    return fn


def default_Q(dim: int, p) -> Convex:
    # cone over (grad u, s): ||grad u||^p <= s ; rows 1..dim are the
    # gradient components, row dim+1 is s (see default_D).
    # Memoized so repeated amgb calls reuse the same barrier callable —
    # jitted solver kernels are cached by barrier identity.
    key = (dim, p) if isinstance(p, (int, float)) else None
    if key is not None and key in _DEFAULT_Q_CACHE:
        return _DEFAULT_Q_CACHE[key]
    Q = convex_Euclidian_power(idx=tuple(range(1, dim + 2)), p=p)
    if key is not None:
        _DEFAULT_Q_CACHE[key] = Q
    return Q


# ----------------------------------------------------------------------------
# Solution containers (field names match the reference,
# docs/src/api.md:89-103)
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class PhaseLog:
    t_elapsed: float
    ts: list
    its: np.ndarray  # (levels,) Newton iterations per level
    c_dot_Dz: list
    t_begin: float
    t_end: float
    converged: bool


@dataclasses.dataclass
class AMGBSOL:
    z: jnp.ndarray  # (n, nfields) solution in the broken space
    SOL_feasibility: Optional[PhaseLog]
    SOL_main: PhaseLog
    log: list
    geometry: Geometry


class AMGBConvergenceFailure(RuntimeError):
    pass


# ----------------------------------------------------------------------------
# Solver context: per-level jitted Newton kernels
# ----------------------------------------------------------------------------


def _apply_D(ops, spec: DSpec, z):
    cols = [ops[op].matvec(z[:, f]) for (f, op) in spec.entries]
    return jnp.stack(cols, axis=1)


def _masked_wsum(w, vals):
    """sum(w * vals) ignoring zero-weight (padding) rows, where vals may be
    NaN on padded rows (0 * NaN = NaN otherwise)."""
    return jnp.sum(jnp.where(w != 0, w * vals, 0.0))


class _SolverCtx:
    """Per-(geometry, problem) solver state: element-local operator tensors
    and per-level jitted Newton step functions.

    TPU-native data layout (see runtime/elements.py): for level l the
    combined operator-on-subspace D_j @ R_l is the batched tensor
    B_l: (nelem, nq, k, nl) plus node ids idx_l: (nelem, nl).  One Newton
    step is: vmap'd barrier derivatives -> batched element Hessians (MXU)
    -> dense Cholesky or MG-CG solve -> line search, all inside one jit.
    The reference assembles the same objects as a distributed SpGEMM chain
    re-planned every iteration (SURVEY.md §3.1, tools/profile_hash.jl:63-66).
    """

    def __init__(
        self,
        geometry: Geometry,
        spec: DSpec,
        barrier: Callable,
        c: jnp.ndarray,
        subspace: str = "dirichlet",
        armijo: float = 0.25,
        max_backtrack: int = 60,
        linear_solver: Optional[Callable] = None,
        x=None,
        cg_rtol: float = 1e-9,
        cg_maxiter: int = 200,
        newton_cap: int = 200,
        newton_patience: Optional[int] = None,
    ):
        self.geometry = geometry
        self.spec = spec
        self.barrier = barrier
        self.c = c
        self.subspace = subspace
        self.armijo = armijo
        self.max_backtrack = max_backtrack
        self.linear_solver = linear_solver
        self.cg_rtol = float(os.environ.get("MGB_CG_RTOL", cg_rtol))
        # On accelerator backends the per-step CG budget is the per-kernel
        # device-time bound (one Newton step = one kernel at chunk 1, and
        # CG is its dominant cost): a mid-path step that saturates 200 its
        # at fem2d L=7 runs ~20s of device time and trips the TPU worker
        # watchdog (the historical L=7/L=8 "kernel fault" crashes).  80 its
        # keeps the worst-case kernel well under the limit; the CG warm
        # start (_build_step) carries the truncated direction into the next
        # step, so a hard step that needs ~200 its gets them as 80-it
        # resumable slices across consecutive Newton steps instead of one
        # watchdog-fatal kernel.
        if jax.default_backend() != "cpu" and cg_maxiter == 200:
            cg_maxiter = 80
        self.cg_maxiter = int(os.environ.get("MGB_CG_MAXITER", cg_maxiter))
        self.newton_cap = newton_cap
        # Patience soft-accept is DISABLED by default (0): measured on
        # fem2d L=6, truncating a moderately-centered creep just moves the
        # grind to the next t (266 its / worse objective / 2x wall vs 299
        # its without).  The env knob remains for experiments.
        if newton_patience is None:
            newton_patience = int(os.environ.get("MGB_NEWTON_PATIENCE", "0"))
        self.newton_patience = newton_patience
        # Quadratic-region plateau window W (MGB_STALL_WIN): the stall
        # detector compares min(lam2 over last W its) against min(lam2
        # over the W before those); at the arithmetic floor lam2 bounces
        # in a band, so smaller W accepts the floor sooner.  Measured
        # (round 3): W=2 vs W=3 gives IDENTICAL objectives at fem2d L=5
        # (27.3607025315) and L=6 (15.4183231432) and lands inside the
        # documented floor-stop band at L=7 (9.4157477 vs band
        # 9.415747-9.415769, ~2e-6 rel) with 123 vs 169 fine its (-27%)
        # — the endgame t-stages were spending 5-9 iterations past the
        # last productive step re-confirming the plateau.
        self.stall_win = int(os.environ.get("MGB_STALL_WIN", "2"))
        # Device-kernel chunk size for the Newton loop (see _build_loop).
        # On accelerator backends the default is 1: the axon TPU worker
        # kills long-running kernels ("kernel fault"), and a mid-path
        # Newton step whose CG saturates maxiter already runs ~10s at
        # fem2d L=7 — a 4-step chunk reliably trips the watchdog (the
        # L=7/L=8 bench crashes), while per-chunk host RTT (30-100ms via
        # the tunnel) is noise against the chunk's device time.  CPU has
        # no watchdog, so it keeps the larger chunk to amortize callback
        # overhead.
        default_chunk = "1" if jax.default_backend() != "cpu" else "4"
        self.newton_chunk = int(
            os.environ.get("MGB_NEWTON_CHUNK", default_chunk)
        )
        # Line-search start: "full" tries alpha=1 and lets Armijo +
        # feasibility (NaN -> reject) backtrack — the long-step IPM
        # schedule; "damped" starts at the self-concordance step
        # 1/(1+lam).  A/B knob for the endgame grind (50+ damped its per
        # t at t>=1e5: alpha0 ~ 1/lam makes per-it progress ~ constant).
        self.ls_full = os.environ.get("MGB_LS_ALPHA0", "damped") == "full"

        g = geometry
        self.levels = len(g.bases[subspace])
        self.x = g.x if x is None else x  # may carry extra aux columns
        self.w = g.w
        self.ops = g.operators
        self.backend = g.backend

        # Element-local operator tensors per level, with the field
        # embedding baked in: P_l[e, q, j, fj*nl + a] = (D_{op_j} R_l)
        # restricted to element e.  With P, the Newton step's gradient /
        # Hessian / direction all become single fused batched MXU
        # contractions over the (q, j) axis (see _build_step) instead of a
        # k^2/2 loop of small einsums.
        self._bases = g.bases[subspace]
        self._embeds = g.embed.get(subspace, ())
        nf = spec.nfields
        self._P = []
        for lvl in range(self.levels):
            rloc = self._bases[lvl].rloc  # (nelem, nq, nl)
            nelem, nq, nl = rloc.shape
            P = jnp.zeros((nelem, nq, spec.k, nf * nl), dtype=rloc.dtype)
            for j, (fj, opname) in enumerate(spec.entries):
                op = self.ops[opname]
                Bj = rloc if op.is_identity else jnp.einsum(
                    "eqr,era->eqa", op.blocks, rloc
                )
                P = P.at[:, :, j, fj * nl : (fj + 1) * nl].set(Bj)
            self._P.append(P)

        # GSPMD placement: element-batched tensors are sharded over the
        # 'dof' mesh axis (the reference's row-block MPI distribution,
        # SURVEY.md §2.5); subspace coefficient vectors stay replicated, so
        # segment-sum scatters lower to a local scatter + psum over ICI.
        be = self.backend
        if be.mesh is not None:
            self._P = [be.shard_rows(P) for P in self._P]
            self._bases = tuple(
                dataclasses.replace(
                    b,
                    idx=be.shard_rows(b.idx),
                    rloc=be.shard_rows(b.rloc),
                    scatter_idx=be.replicate(b.scatter_idx),
                )
                for b in self._bases
            )
            self.x = be.shard_rows(self.x)
            self.w = be.shard_rows(self.w)
            self.c = be.shard_rows(self.c)

        from ..runtime.pallas_kernels import pallas_enabled

        # Pallas assembly only on UNMESHED backends: Mosaic kernels have
        # no SPMD partitioning rule, so inside a GSPMD program a
        # pallas_call over element-sharded operands either fails to
        # compile or forces a full all-gather per step — the compile
        # probe (tiny, unsharded) cannot catch that.
        self._use_pallas = self.backend.mesh is None and pallas_enabled(
            geometry.x.dtype
        )
        self._steps = {}
        self._hosts = {}
        self._loops = {}
        self._warmed = False
        self._eval = self._build_eval()

    # -- jitted pieces ------------------------------------------------------

    def _build_eval(self):
        spec, barrier, ops = self.spec, self.barrier, self.ops

        def evaluate(x, w, c, z, t):
            y = _apply_D(ops, spec, z)
            F0v = jax.vmap(barrier)(x, y)
            cy = jnp.sum(w * jnp.sum(c * y, axis=1))
            fy = _masked_wsum(w, F0v)
            return t * cy + fy, cy

        return jax.jit(evaluate)

    def _assemble_He(self, P, Y2w_e):
        """Batched element Hessians (nelem, C, C), C = nf*nl, from the
        barrier row Hessians Y2w_e (nelem, nq, k, k) — the reference's
        H = sum_{j,l} D_j' diag(w.*y_jl) D_l restricted per element
        (test/test_map_rows_compare.jl:110-139) as TWO fused batched MXU
        contractions: He = P^T (Y2w ⊕ blockdiag over q) P.  The f32 TPU
        path can route through the fused Pallas kernel (MGB_PALLAS=1)."""
        if self._use_pallas:
            from ..runtime.pallas_kernels import assemble_he_pallas

            return assemble_he_pallas(P, Y2w_e)
        T = jnp.einsum("eqjl,eqlc->eqjc", Y2w_e, P)
        return jnp.einsum("eqjc,eqjd->ecd", P, T)

    def _get_mgcg_ndcoarse(self, level: int):
        """ND-factored coarse solve for the truncated two-grid MG-CG
        cycle when the fine-1 level exceeds the dense coarse cap
        (linsolve.mgcg_solve truncation comment; round-4 verdict item 6
        — the reference's MUMPS is exact at every scale,
        /root/reference/src/MultiGridBarrierMPI.jl:87).

        Returns (static, args): `static` carries the NDFactorizer + the
        segment count (closed over by the jitted step), `args` the
        device-operand index maps (threaded as jit ARGUMENTS — closure
        constants of this size get serialized into the HLO and the
        remote compile service rejects them, CLAUDE.md session-3).
        (None, {}) when the level's cycle keeps the dense coarse."""
        subs = self._sub_levels(level)
        if len(subs) < 3:
            return None, {}
        lc = subs[-2]
        cap = int(os.environ.get("MGB_MGCG_COARSE_CAP", "4096"))
        if self.spec.nfields * (self._bases[lc].m + 1) <= cap:
            return None, {}
        pattern = self._get_host_pattern(lc)  # creates self._hosts[lc]
        h = self._hosts[lc]
        if "mgcg_ndc" not in h:
            from .ndsolve import NDFactorizer, NDSymbolic, node_coords

            basis_c = self._bases[lc]
            sym = NDSymbolic(
                np.asarray(basis_c.idx),
                basis_c.m,
                self.spec.nfields,
                node_coords(
                    np.asarray(basis_c.idx), basis_c.m,
                    np.asarray(self.geometry.x), basis_c.nq,
                ),
                leaf=int(os.environ.get("MGB_ND_LEAF", "16")),
            )
            fz = NDFactorizer(
                sym, dtype=self.backend.dtype, mesh=self.backend.mesh
            )

            class _Static:
                pass

            st = _Static()
            st.fz = fz
            st.nseg = pattern.nseg
            h["mgcg_ndc"] = (
                st,
                dict(
                    consts=fz.consts(),
                    full_ids=jnp.asarray(pattern.full_ids),
                ),
            )
        return h["mgcg_ndc"]

    def _build_step(self, level: int):
        spec, barrier, ops = self.spec, self.barrier, self.ops
        nf, k = spec.nfields, spec.k
        armijo, max_bt = self.armijo, self.max_backtrack
        ls_full = self.ls_full
        F1 = jax.grad(barrier, argnums=1)
        F2 = jax.hessian(barrier, argnums=1)
        custom_solve = self.linear_solver

        basis = self._bases[level]
        m, nl, nq = basis.m, basis.nl, basis.nq
        # static solver choice per level: dense Cholesky below the
        # threshold (the coarse-grid MUMPS replacement), MG-CG above
        use_dense = (
            custom_solve is not None
            or nf * m <= self.backend.dense_threshold
            or level == 0
        )
        sub_levels = self._sub_levels(level)
        cg_rtol, cg_maxiter = self.cg_rtol, self.cg_maxiter
        use_warmstart = (
            os.environ.get("MGB_CG_WARMSTART", "1") != "0"
        ) and not use_dense

        n_smooth = max(1, len(sub_levels) - 1)
        # ND-factored coarse for the truncated two-grid cycle (static
        # half; the index-map half rides the `ndc` jit argument)
        ndc_static = (
            None if use_dense else self._get_mgcg_ndcoarse(level)[0]
        )

        def step(Ps, bases, embeds, rloc, x, w, c, z, t, lmaxs, cg_eta,
                 dv_prev, ndc):
            # Ps/bases: per-sublevel element tensors (finest = Ps[-1]).
            # cg_eta: forcing term for this step's linear solve (currently
            # constant = cg_rtol; see the measured rejection of adaptive
            # loosening in _build_loop).
            Pl, idx = Ps[-1], bases[-1].idx
            nelem = Pl.shape[0]
            y = _apply_D(ops, spec, z)
            F0v = jax.vmap(barrier)(x, y)
            cy = jnp.sum(w * jnp.sum(c * y, axis=1))
            fy0 = _masked_wsum(w, F0v)
            phi0 = t * cy + fy0

            # gradient rows -> one fused contraction -> scatter
            F1v = jax.vmap(F1)(x, y)  # (n, k)
            gy = (w[:, None] * (t * c + F1v)).reshape(nelem, nq, k)
            gf = jnp.einsum("eqj,eqjc->ec", gy, Pl)  # (nelem, nf*nl)
            gv = bases[-1].scatter_add(
                gf.reshape(nelem, nf, nl).transpose(0, 2, 1).reshape(-1, nf)
            ).T  # (nf, m+1), pad row zeroed

            # element Hessians at every sub-level (shared row Hessians)
            Y2w = jax.vmap(F2)(x, y) * w[:, None, None]  # (n, k, k)
            Y2w_e = Y2w.reshape(nelem, nq, k, k)
            if use_dense:
                systems = [LevelSystem(self._assemble_He(Pl, Y2w_e), idx, m)]
            else:
                systems = [
                    LevelSystem(
                        self._assemble_He(Ps[i], Y2w_e),
                        bases[i].idx,
                        self._bases[sl].m,
                        pair_idx=bases[i].pair_idx,
                    )
                    for i, sl in enumerate(sub_levels)
                ]

            cg_iters = jnp.asarray(0, dtype=jnp.int32)
            cg_rel = jnp.asarray(0.0, dtype=z.dtype)
            lmaxs_new = lmaxs
            if custom_solve is not None:
                from .linsolve import dense_assemble

                H = dense_assemble(systems[-1], nf)
                dvp = custom_solve(H, -gv.reshape(-1)).reshape(nf, m + 1)
                dvp = dvp.at[:, m].set(0.0)
            elif use_dense:
                dvp = dense_solve(systems[-1], nf, -gv)
            else:
                dvp, cg_iters, cg_rel, lmaxs_new = mgcg_solve(
                    systems,
                    embeds,
                    -gv,
                    nf,
                    rtol=cg_eta,
                    maxiter=cg_maxiter,
                    lmaxs_in=lmaxs,
                    # warm start: the previous Newton direction captures
                    # most of the new system's decrement late in the path
                    # (see mgcg_solve); gated off for cold shapes
                    x0_in=dv_prev if use_warmstart else None,
                    coarse_nd=ndc_static,
                    coarse_nd_args=ndc if ndc_static is not None else None,
                )
            lam2 = -jnp.vdot(gv, dvp)

            # direction in Dz-space and broken space (fused contraction)
            dve = dvp[:, idx]  # (nf, nelem, nl)
            dve_flat = dve.transpose(1, 0, 2).reshape(nelem, nf * nl)
            dY = jnp.einsum("eqjc,ec->eqj", Pl, dve_flat).reshape(-1, k)
            c_dY = jnp.sum(w * jnp.sum(c * dY, axis=1))

            lam = jnp.sqrt(jnp.maximum(lam2, 0.0))
            alpha0 = (
                jnp.ones_like(lam)
                if ls_full
                else jnp.where(lam <= 0.25, 1.0, 1.0 / (1.0 + lam))
            )

            def dphi_of(alpha):
                # difference form: at large t, |phi| ~ t while the Armijo
                # decrease is O(lam2); evaluating phi(a) - phi(0) directly
                # avoids the |phi|*eps cancellation floor
                ya = y + alpha * dY
                dfy = _masked_wsum(w, jax.vmap(barrier)(x, ya)) - fy0
                return t * alpha * c_dY + dfy

            def accept(alpha, dphi):
                return jnp.isfinite(dphi) & (dphi <= -armijo * alpha * lam2)

            def cond(state):
                alpha, dphia, it = state
                return (~accept(alpha, dphia)) & (it < max_bt)

            def body(state):
                alpha, _, it = state
                alpha = alpha * 0.5
                return alpha, dphi_of(alpha), it + 1

            alpha, dphia, bt = jax.lax.while_loop(
                cond, body, (alpha0, dphi_of(alpha0), 0)
            )
            alpha = jnp.where(accept(alpha, dphia), alpha, 0.0)

            dz = jnp.einsum("eqa,fea->eqf", rloc, dve).reshape(z.shape)
            # guard: with alpha == 0 (rejected step) dz may carry NaNs from
            # a broken solve; 0 * NaN would corrupt z
            z_new = jnp.where(alpha > 0, z + alpha * dz, z)
            dphi = jnp.where(alpha > 0, dphia, 0.0)
            return (z_new, lam2, alpha, phi0, cy, dphi, lmaxs_new,
                    cg_iters, cg_rel, dvp)

        step.n_smooth = n_smooth
        return step

    # Newton-loop stop codes (run_level return)
    RUNNING, CONVERGED, LOCKED, STALLED, DIVERGED, CAPPED = 0, 1, 2, 3, 4, 5

    def _build_loop(self, level: int):
        """Jit the per-level Newton iteration in resumable device chunks:
        one device round-trip per `newton_chunk` Newton steps instead of
        per step (tunnel/dispatch latency would otherwise dominate on TPU
        — the reference's analogue is one MPI collective sequence per
        iteration, SURVEY.md §3.4) and instead of per (t, level) (a
        monolithic kernel trips the shared TPU worker's long-kernel
        watchdog; see the chunking comment below)."""
        raw = self._build_step(level)
        patience = self.newton_patience
        # Chunked execution: each device call runs at most `chunk` Newton
        # iterations; run_level resumes from the host until a stop code.
        # One monolithic while_loop per (t, level) produced device kernels
        # running for minutes at L>=7 with the quadratic-model CG, and the
        # shared TPU worker kills long-running kernels ("kernel fault",
        # reproducible at L=7 t=10 and the round-1 L=8 warmup).  The extra
        # host syncs cost ~RTT per chunk (30-100ms via the tunnel) — noise
        # against the chunk's device time.  The first HIST slots of each
        # trace array carry the previous chunk's tail so the stall windows
        # see continuous history; kg0 is the global iteration offset that
        # keeps their warm-up guards global.
        chunk = self.newton_chunk
        if (
            chunk == 1
            and self.spec.nfields * self._bases[level].m
            <= self.backend.dense_threshold
            and os.environ.get("MGB_NEWTON_CHUNK") is None
        ):
            # DENSE coarse levels: the whole Newton step is one small
            # MXU contraction + Cholesky (tens of ms) — far below the
            # accelerator watchdog that forces chunk=1 on the big
            # iterative/ND levels — so amortize the per-chunk dispatch
            # RTT (~40ms via the tunnel) over a few steps (the traced
            # loop's cond still exits at the first stop code, so no
            # iterations are wasted).
            chunk = 4
        HIST = max(5, 2 * self.stall_win - 1)

        def loop(Bs, idxs, embeds, rloc, x, w, c, z0, t, theta2, lmax0,
                 hist0, kg0, dv0, ndc):
            dtype = z0.dtype
            tr0 = {
                key: jnp.zeros(chunk + HIST, dtype=dtype).at[:HIST].set(
                    hist0[key]
                )
                for key in (
                    "lam2", "alpha", "phi", "dphi", "cy", "cgits", "cgrel"
                )
            }
            state0 = dict(
                z=z0,
                k=jnp.asarray(HIST, jnp.int32),
                code=jnp.asarray(0, jnp.int32),
                tr=tr0,
                # smoother eigenvalue estimates, carried across chunks and
                # across the level run (<= 0 means "estimate now")
                lmax=lmax0,
                # previous Newton direction (CG warm start), carried the
                # same way
                dv=dv0,
            )

            def cond(s):
                return (s["code"] == 0) & (s["k"] < chunk + HIST)

            def body(s):
                z, k, tr = s["z"], s["k"], s["tr"]
                # Constant tight forcing term.  Eisenstat-Walker-style
                # loosening (eta ~ 0.1 in the damped phase) was measured
                # and REJECTED: on barrier Hessians a sloppy direction
                # points into the cone boundary, the line search collapses
                # to alpha ~ 1e-3, and the damped phase takes 2-4x more
                # Newton iterations (fem2d L=5: 251 vs 111 fine its) while
                # converging LESS deep.  Inexactness is already handled
                # adaptively by mgcg_solve's q-stagnation exit.
                eta = jnp.asarray(self.cg_rtol, dtype=dtype)
                (z_new, lam2, alpha, phi0, cy, dphi, lmax_new, cgits,
                 cgrel, dv_new) = raw(
                    Bs, idxs, embeds, rloc, x, w, c, z, t, s["lmax"], eta,
                    s["dv"], ndc
                )
                tr = dict(
                    lam2=tr["lam2"].at[k].set(lam2),
                    alpha=tr["alpha"].at[k].set(alpha),
                    phi=tr["phi"].at[k].set(phi0),
                    dphi=tr["dphi"].at[k].set(dphi),
                    cy=tr["cy"].at[k].set(cy),
                    cgits=tr["cgits"].at[k].set(
                        cgits.astype(dtype)
                    ),
                    cgrel=tr["cgrel"].at[k].set(cgrel.astype(dtype)),
                )
                # stop conditions (see _path_follow for semantics)
                nanv = ~jnp.isfinite(lam2)
                locked = alpha == 0.0
                conv = lam2 <= theta2
                # Stall detection must respect the two Newton regimes:
                # * quadratic region (lam2 <= 0.25): exact Newton contracts
                #   lam2 geometrically, so a plateau there means the
                #   arithmetic floor — accept as centered.
                # * damped region (lam2 > 0.25): lam2 routinely plateaus
                #   while phi decreases by the guaranteed O(1) per step —
                #   NEVER accept on a lam2 plateau (doing so abandons the
                #   iterate far from the central path and silently returns
                #   wrong solutions).  There, only a phi-progress floor
                #   (decrease at the |phi|*eps noise level) counts.
                kg = kg0 + (k - HIST)  # global iteration index
                W = self.stall_win  # static at trace time
                recentW = jax.lax.dynamic_slice(
                    tr["lam2"], (k - (W - 1),), (W,)
                )
                prevW = jax.lax.dynamic_slice(
                    tr["lam2"], (k - (2 * W - 1),), (W,)
                )
                stall_quad = (
                    (kg >= 2 * W - 1)
                    & (lam2 <= 0.25)
                    & (jnp.min(recentW) >= 0.95 * jnp.min(prevW))
                )
                eps = jnp.asarray(jnp.finfo(z0.dtype).eps, dtype=z0.dtype)
                dphi3 = jax.lax.dynamic_slice(tr["dphi"], (k - 2,), (3,))
                # |phi0|-scaled: deliberately CONSERVATIVE.  dphi is
                # measured in difference form whose true noise is only
                # ~eps*|fy0|, but iterating down to that floor makes the
                # line search accept noise-direction micro-steps (measured:
                # an f32 leg with an eps*|fy0| floor spends ~15% more
                # iterations and hands off a WORSE-centered iterate).
                # Stalling early is cheap — path continuation self-corrects.
                floor = 64.0 * eps * (jnp.abs(phi0) + 1.0)
                stall_floor = (kg >= 2) & (jnp.max(jnp.abs(dphi3)) <= floor)
                # Patience bound: once moderately centered (lam <= 5), a
                # long monotone creep adds accuracy only at the 4th-5th
                # decimal of the objective (measured fem2d L=6: 95 creep
                # iterations at t=1e6 bought 6e-5 relative) — path
                # continuation self-corrects, so accept and move t instead
                # of grinding.  Far-off iterates (lam2 > 25, e.g. a
                # mixed-precision handoff) are exempt: accepting those
                # abandons the path.
                patient = (
                    (patience > 0) & (kg + 1 >= patience) & (lam2 <= 25.0)
                )
                stall = stall_quad | stall_floor | patient
                # (the newton_cap bound lives on the host in run_level; a
                # chunk ending with code 0 simply resumes)
                code = jnp.where(
                    nanv,
                    self.DIVERGED,
                    jnp.where(
                        locked,
                        self.LOCKED,
                        jnp.where(
                            conv,
                            self.CONVERGED,
                            jnp.where(stall, self.STALLED, self.RUNNING),
                        ),
                    ),
                ).astype(jnp.int32)
                return dict(
                    z=z_new, k=k + 1, code=code, tr=tr, lmax=lmax_new,
                    dv=dv_new
                )

            s = jax.lax.while_loop(cond, body, state0)
            kend = s["k"]
            hist_out = {
                key: jax.lax.dynamic_slice(s["tr"][key], (kend - HIST,), (HIST,))
                for key in tr0
            }
            return (s["z"], kend - HIST, s["code"], s["tr"], s["lmax"],
                    hist_out, s["dv"])

        return jax.jit(loop)

    # -- host sparse direct path (fine levels) ------------------------------

    def _host_enabled(self, level: int) -> bool:
        """Fine levels solve their Newton systems with the host sparse
        direct solver (hostsolve module doc: direct factorization is
        mathematically required mid-path, and factor reuse makes it cheap).
        Meshed backends use it too: under single-controller GSPMD the
        device half (pre/step) runs sharded with XLA collectives and
        jax.device_get gathers the nnz values, so the host solve is
        placement-agnostic (measured: identical its and c to 1.3e-9 vs
        the single-device run at fem2d L=4 on an 8-device mesh).
        MG-CG remains via MGB_FINE_SOLVER=mgcg — the scale-out path when
        a serialized host solve would bottleneck (Amdahl) and the A/B
        baseline (tools/ab_fine_solver.py)."""
        if self.linear_solver is not None or level == 0:
            return False
        if self.spec.nfields * self._bases[level].m <= self.backend.dense_threshold:
            return False
        return self._fine_solver() == "host"

    def _fine_solver(self) -> str:
        """Fine-level Newton-system solver: 'nd' (on-device nested-
        dissection multifrontal Cholesky, solver/ndsolve.py), 'host'
        (host SuperLU with factor reuse, solver/hostsolve.py), or
        'mgcg' (on-device multigrid-preconditioned CG)."""
        return os.environ.get("MGB_FINE_SOLVER", "nd")

    def _nd_enabled(self, level: int) -> bool:
        if self.linear_solver is not None or level == 0:
            return False
        if self.spec.nfields * self._bases[level].m <= self.backend.dense_threshold:
            return False
        return self._fine_solver() == "nd"

    def _get_host(self, level: int):
        from .hostsolve import HostDirectLevel

        pattern = self._get_host_pattern(level)
        h = self._hosts[level]
        if "pre" not in h:
            pre = self._build_host_pre(level)
            post = self._build_host_post(level)

            # One Newton step = ONE device program: line-search/update for
            # the solved direction (post, step k) fused with the assembly
            # for the next step (pre, step k+1).  On the axon tunnel each
            # device call costs a 30-100ms RTT, and the host loop blocks
            # once per step on device_get — fusing post+pre makes that one
            # blocking sync per Newton iteration instead of two (plus one
            # wasted pre on the stopping iteration, milliseconds of device
            # time).
            def step(Pl, basis_l, rloc, x, w, c, z, t, y, cy, fy0, gv,
                     dvp, full_ids):
                z_new, lam2, alpha, dphi = post(
                    Pl, basis_l.idx, rloc, x, w, c, z, t, y, cy, fy0, gv,
                    dvp,
                )
                vals2, gv2, y2, cy2, fy02 = pre(
                    Pl, basis_l, x, w, c, z_new, t, full_ids
                )
                return z_new, lam2, alpha, dphi, vals2, gv2, y2, cy2, fy02

            h.update(
                solver=HostDirectLevel(
                    pattern,
                    rtol=self.cg_rtol,
                    stale_cap=int(
                        os.environ.get("MGB_HOST_STALE_CAP", "40")
                    ),
                ),
                full_ids=jnp.asarray(pattern.full_ids),
                pre=jax.jit(pre),
                step=jax.jit(step),
            )
        return h

    def _build_host_pre(self, level: int):
        """Device half 1 of a host-solved Newton step: barrier derivatives,
        gradient scatter, element Hessians, and the segment-sum reduction
        to deduplicated sparse values (hostsolve.HostPattern) — everything
        up to (and excluding) the linear solve, as fused MXU contractions."""
        spec, barrier, ops = self.spec, self.barrier, self.ops
        nf, k = spec.nfields, spec.k
        F1 = jax.grad(barrier, argnums=1)
        F2 = jax.hessian(barrier, argnums=1)
        basis = self._bases[level]
        nl, nq = basis.nl, basis.nq
        nseg = self._get_host_pattern(level).nseg

        def pre(Pl, basis_l, x, w, c, z, t, full_ids):
            nelem = Pl.shape[0]
            y = _apply_D(ops, spec, z)
            F0v = jax.vmap(barrier)(x, y)
            cy = jnp.sum(w * jnp.sum(c * y, axis=1))
            fy0 = _masked_wsum(w, F0v)
            F1v = jax.vmap(F1)(x, y)
            gy = (w[:, None] * (t * c + F1v)).reshape(nelem, nq, k)
            gf = jnp.einsum("eqj,eqjc->ec", gy, Pl)
            gv = basis_l.scatter_add(
                gf.reshape(nelem, nf, nl).transpose(0, 2, 1).reshape(-1, nf)
            ).T  # (nf, m+1), pad row zeroed
            Y2w = jax.vmap(F2)(x, y) * w[:, None, None]
            He = self._assemble_He(Pl, Y2w.reshape(nelem, nq, k, k))
            vals = jax.ops.segment_sum(
                He.reshape(-1), full_ids.reshape(-1), num_segments=nseg
            )
            return vals, gv, y, cy, fy0

        return pre

    def _get_host_pattern(self, level: int):
        from .hostsolve import HostPattern

        if level not in self._hosts:
            basis = self._bases[level]
            self._hosts[level] = dict(
                pattern=HostPattern(
                    np.asarray(basis.idx), basis.m, self.spec.nfields
                )
            )
        return self._hosts[level]["pattern"]

    # -- on-device nested-dissection direct path (fine levels) --------------

    def _get_nd(self, level: int):
        """ND solver state: symbolic factorization (host, cached) + the
        fully-fused Newton-step program (line search + assembly + factor
        + solve, all inside one jit — the only per-iteration host
        traffic is the stop-logic scalars)."""
        from .ndsolve import NDFactorizer, NDSymbolic, node_coords

        pattern = self._get_host_pattern(level)
        h = self._hosts[level]
        if "nd_step" not in h:
            basis = self._bases[level]
            m, nf = basis.m, self.spec.nfields
            gx = np.asarray(self.geometry.x)
            sym = NDSymbolic(
                np.asarray(basis.idx),
                m,
                nf,
                node_coords(basis.idx, m, gx, basis.nq),
                leaf=int(os.environ.get("MGB_ND_LEAF", "16")),
            )
            dtype = self.backend.dtype
            fz = NDFactorizer(sym, dtype=dtype, mesh=self.backend.mesh)
            pre = self._build_host_pre(level)
            post = self._build_host_post(level)
            nuniq = sym.nuniq
            # All large index maps travel as runtime ARGUMENTS of the
            # jitted programs (device operands), never as closure
            # constants: literal constants are serialized into the HLO
            # and the axon remote compile service rejects the resulting
            # multi-hundred-MB request with HTTP 413 (seen at L=7).
            from .ndsolve import narrow_idx as _idx

            consts = dict(
                nd=fz.consts(),
                pair_i=_idx(sym.pair_i),
                pair_j=_idx(sym.pair_j),
                pair_pid=_idx(sym.pair_pid),
                pair_ia=_idx(sym.pair_i_all),
                pair_ja=_idx(sym.pair_j_all),
                # node-major per-dof diagonal ids: vals[(f*nf+f)*nuniq+d]
                diag_ids=_idx(
                    (
                        (np.arange(nf, dtype=np.int64) * (nf + 1))[None, :]
                        * nuniq
                        + sym.diag_pid[:, None]
                    ).reshape(-1)
                ),
            )

            def matvec(vals, xv, cst):
                """Exact A @ x from the deduplicated pair blocks."""
                vb = vals.reshape(nf, nf, nuniq)
                xm = xv.reshape(m, nf)
                contrib = jnp.einsum(
                    "fgp,pg->pf",
                    vb[:, :, cst["pair_pid"]],
                    xm[cst["pair_j"]],
                )
                return jax.ops.segment_sum(
                    contrib, cst["pair_i"], num_segments=m
                ).reshape(-1)

            def make_direction(fdt, n_cg, return_fac=False):
                """Newton direction at factor precision `fdt` (None =
                solver dtype): on-device multifrontal factor + solve +
                factor-preconditioned CG polish in full precision (the
                dense path's recipe, linsolve.dense_solve), with a
                Jacobi fallback when a floor-singular factorization
                surfaces NaNs (keeps a descent direction so the damped
                line search — not a poisoned iterate — decides).

                With fdt=float32 this is the classic mixed-precision
                direct solve: the factorization and triangular sweeps
                run at MXU-native f32 rate while residuals, quadratic
                model and the accepted direction stay f64 — valid while
                eps32*cond(H) << 1, staged by t in _run_level_nd."""

                def direction(vals, gv, cst):
                    b = -gv[:, :m].T.reshape(-1)
                    ndc = cst["nd"]
                    if fdt is not None:
                        # Symmetric Jacobi equilibration BEFORE the cast
                        # (the same invariant as the f32 V-cycle,
                        # linsolve.mgcg: barrier diagonals span ~t in
                        # magnitude, and casting the unscaled system to
                        # f32 poisons the Schur chain — measured at fem2d
                        # L=6: path drifts 3e-4 shallow even with t<=1e4
                        # staging and a CG-7 f64 polish).  Factor
                        # D^-1/2 A D^-1/2 (unit diagonal) in f32 and
                        # conjugate every application by s = D^-1/2.
                        dgv = jnp.abs(vals[cst["diag_ids"]])
                        s = jax.lax.rsqrt(jnp.maximum(dgv, 1e-300))
                        snf = jnp.concatenate(
                            [s.reshape(m, nf), jnp.ones((1, nf), s.dtype)]
                        )  # (m+1, nf); pad node scale = 1
                        ri = snf.T[:, cst["pair_ia"]][:, None, :]
                        cj = snf.T[:, cst["pair_ja"]][None, :, :]
                        vals_f = (
                            vals.reshape(nf, nf, -1) * ri * cj
                        ).reshape(-1)
                    else:
                        s = None
                        vals_f = vals
                    fac = fz.factor(vals_f, ndc, dtype=fdt)

                    def apply_fac(r):
                        if s is None:
                            return fz.solve(fac, r, ndc).astype(r.dtype)
                        return s * fz.solve(fac, s * r, ndc).astype(r.dtype)

                    xv = apply_fac(b)

                    def cg_body(_, st):
                        xv, r, p, rz = st
                        Ap = matvec(vals, p, cst)
                        pAp = jnp.vdot(p, Ap)
                        ok = (
                            jnp.isfinite(pAp)
                            & (pAp > 0)
                            & jnp.isfinite(rz)
                            & (rz > 0)
                        )
                        al = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
                        xv = xv + al * p
                        r = r - al * Ap
                        z2 = apply_fac(r)
                        rz2 = jnp.vdot(r, z2)
                        beta = jnp.where(
                            ok & (rz2 > 0), rz2 / jnp.where(ok, rz, 1.0), 0.0
                        )
                        p = jnp.where(ok, z2 + beta * p, p)
                        return xv, r, p, rz2

                    if n_cg:
                        r0 = b - matvec(vals, xv, cst)
                        z0 = apply_fac(r0)
                        st = (xv, r0, z0, jnp.vdot(r0, z0))
                        xv_cg = jax.lax.fori_loop(0, n_cg, cg_body, st)[0]

                        def q_of(v):
                            return 0.5 * jnp.vdot(
                                v, matvec(vals, v, cst)
                            ) - jnp.vdot(b, v)

                        q_ir, q_cg = q_of(xv), q_of(xv_cg)
                        take_cg = (
                            jnp.all(jnp.isfinite(xv_cg))
                            & jnp.isfinite(q_cg)
                            & (q_cg <= q_ir)
                        )
                        xv = jnp.where(take_cg, xv_cg, xv)
                    dg = jnp.maximum(jnp.abs(vals[cst["diag_ids"]]), 1e-300)
                    ok = jnp.all(jnp.isfinite(xv))
                    xv = jnp.where(ok, xv, b / dg)
                    dvp = jnp.concatenate(
                        [
                            xv.reshape(m, nf).T,
                            jnp.zeros((nf, 1), xv.dtype),
                        ],
                        axis=1,
                    )
                    if return_fac:
                        return dvp, fac
                    return dvp

                return direction

            def make_programs(direction):
                def nd_init(Pl, basis_l, x, w, c, z, t, full_ids, cst):
                    vals, gv, y, cy, fy0 = pre(
                        Pl, basis_l, x, w, c, z, t, full_ids
                    )
                    return gv, y, cy, fy0, direction(vals, gv, cst)

                def nd_step(Pl, basis_l, rloc, x, w, c, z, t, y, cy, fy0,
                            gv, dvp, full_ids, cst):
                    z_new, lam2, alpha, dphi = post(
                        Pl, basis_l.idx, rloc, x, w, c, z, t, y, cy, fy0,
                        gv, dvp,
                    )
                    vals2, gv2, y2, cy2, fy02 = pre(
                        Pl, basis_l, x, w, c, z_new, t, full_ids
                    )
                    dv2 = direction(vals2, gv2, cst)
                    return (z_new, lam2, alpha, dphi, gv2, y2, cy2, fy02,
                            dv2)

                return jax.jit(nd_init), jax.jit(nd_step)

            # CG polish trip counts: each iteration costs a full ND solve
            # + matvec of device time.  Measured at fem2d L=6 (the
            # smallest L whose fine level routes through ND at default
            # dense_threshold): substitution factors (CPU) are exact with
            # NO polish (c_dot_Dz 15.4183231 = ground truth, 141 its,
            # PCG 0/2/6 identical), and with explicit-inverse factors
            # (the accelerator path) PCG 0 and 2 give bit-identical
            # paths (153 its, c 15.4183249) — the polish cannot improve
            # on the inverse-application error floor, so accelerators
            # default to 0 (the polish was 3 of the 4 ND solves per
            # Newton step).  CPU keeps a small safety polish for problem
            # classes beyond the measured ones; the f32-factor programs
            # take one extra trip (the polish doubles as iterative
            # refinement there).
            n_cg = int(
                os.environ.get(
                    "MGB_ND_PCG",
                    "2" if jax.default_backend() == "cpu" else "0",
                )
            )
            nd_init, nd_step = make_programs(make_direction(None, n_cg))
            h.update(
                nd_init=nd_init,
                nd_step=nd_step,
                nd_full_ids=jnp.asarray(pattern.full_ids),
                nd_consts=consts,
            )
            if dtype == jnp.float64:
                n_cg32 = int(os.environ.get("MGB_ND_PCG32", str(n_cg + 1)))
                init32, step32 = make_programs(
                    make_direction(jnp.float32, n_cg32)
                )
                h.update(nd_init32=init32, nd_step32=step32)

            # -- stale-factor reuse programs (_run_level_nd_reuse) -------
            # hostsolve's measured economics, moved on-device: by self-
            # concordance consecutive Newton Hessians are spectrally
            # equivalent, so a stale factor preconditions CG to 1e-9 in
            # ~4-25 iterations across the whole path (hostsolve module
            # doc).  At fem2d L=7 the on-device factor is ~500ms while a
            # solve+matvec is ~25ms (tools/probe_nd_tpu_cost.py), so a
            # reuse step that converges in <~18 PCG its beats refactoring.
            # The direction program is dispatched separately from the
            # post+pre step (two dispatches, still ONE blocking
            # device_get per Newton iteration), because the host must
            # see the PCG quality scalars to decide refactor-vs-reuse
            # before the direction is APPLIED — a discarded direction is
            # never visible to the path.
            def step_nodir(Pl, basis_l, rloc, x, w, c, z, t, y, cy, fy0,
                           gv, dvp, full_ids):
                z_new, lam2, alpha, dphi = post(
                    Pl, basis_l.idx, rloc, x, w, c, z, t, y, cy, fy0, gv,
                    dvp,
                )
                vals2, gv2, y2, cy2, fy02 = pre(
                    Pl, basis_l, x, w, c, z_new, t, full_ids
                )
                return z_new, lam2, alpha, dphi, vals2, gv2, y2, cy2, fy02

            rtol_r = self.cg_rtol

            def nd_dir_r(vals, gv, fac, cst, cap):
                """Newton direction from a STALE factor: PCG on the exact
                current Hessian (matvec from the deduplicated pair blocks)
                preconditioned by `fac`, run to the same cg_rtol the host
                path certifies directions at, with a DYNAMIC trip cap
                (host policy: ~2x the recent success count, so a doomed
                attempt near the conditioning floor wastes little).
                Returns (direction, its, relres); the caller refactors and
                recomputes whenever relres > cg_rtol, so an accepted
                direction is exactly as converged as a fresh-factor one."""
                b = -gv[:, :m].T.reshape(-1)
                ndc = cst["nd"]

                def apply_fac(r):
                    return fz.solve(fac, r, ndc).astype(r.dtype)

                bb = jnp.vdot(b, b)
                tol2 = (rtol_r ** 2) * bb
                xv = apply_fac(b)
                r0 = b - matvec(vals, xv, cst)
                z0 = apply_fac(r0)
                st0 = (xv, r0, z0, jnp.vdot(r0, z0), jnp.vdot(r0, r0),
                       jnp.int32(0))

                def cond(st):
                    _, _, _, _, rr, it = st
                    return jnp.isfinite(rr) & (rr > tol2) & (it < cap)

                def body(st):
                    xv, r, p, rz, rr, it = st
                    Ap = matvec(vals, p, cst)
                    pAp = jnp.vdot(p, Ap)
                    ok = (
                        jnp.isfinite(pAp) & (pAp > 0)
                        & jnp.isfinite(rz) & (rz > 0)
                    )
                    al = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
                    xv = xv + al * p
                    r = r - al * Ap
                    zv = apply_fac(r)
                    rz2 = jnp.vdot(r, zv)
                    beta = jnp.where(
                        ok & (rz2 > 0), rz2 / jnp.where(ok, rz, 1.0), 0.0
                    )
                    p = jnp.where(ok, zv + beta * p, p)
                    # CG breakdown (indefinite/NaN): poison rr so cond
                    # exits and the host sees relres=inf -> refactor
                    rr2 = jnp.where(ok, jnp.vdot(r, r), jnp.inf)
                    return xv, r, p, rz2, rr2, it + 1

                xv, _, _, _, rr, it = jax.lax.while_loop(cond, body, st0)
                rel = jnp.sqrt(jnp.abs(rr) / jnp.maximum(bb, 1e-300))
                rel = jnp.where(jnp.all(jnp.isfinite(xv)), rel, jnp.inf)
                dvp = jnp.concatenate(
                    [xv.reshape(m, nf).T, jnp.zeros((nf, 1), xv.dtype)],
                    axis=1,
                )
                return dvp, it, rel

            # Stage-1 f32 Krylov warm start for f32pc directions
            # (MGB_ND_KRYLOV32): run the bulk of the PCG iteration in
            # the equilibrated f32 frame — f32 matvec on the already-
            # equilibrated (shifted) pair blocks, f32 preconditioner
            # sweeps, f32 vector ops — down to a loose tol, then warm-
            # start the f64 PCG that owns the certification gate.  On
            # v5e every f64 vector op is software-emulated (~12x an f32
            # op, CLAUDE.md round-2 session-9), and certified mid-path
            # steps are PCG-sweep-dominated, so moving the early
            # contraction to f32 cuts the per-step cost while the
            # accepted direction stays exactly as converged (the gate
            # still measures the f64 residual of the exact system).
            k32_on = os.environ.get("MGB_ND_KRYLOV32", "0") == "1"
            k32_tol = float(os.environ.get("MGB_ND_KRYLOV32_TOL", "1e-4"))

            # Cheap-direction factor engine (MGB_ND_CHEAP): 'f32' =
            # shifted-f32 factor (MXU-native rate; needs 15-30 PCG
            # sweeps to certify and dies at t ~ 1e3-1e4), 'df' =
            # pair-f32-base f64 factor (experimental/dfmm.py: the v5e's
            # emulated-f64 base-block chol/substitution replaced by
            # native-f32 double-float kernels, ~2^-44 accuracy) which
            # certifies with ~0 sweeps through t ~ 1e5-1e6
            # (tools/probe_qbits_direction.py) — covering most of the
            # endgame that previously paid the full f64 factor.
            cheap_engine = _nd_cheap_engine()

            def nd_dir_f32(vals, gv, cst, cap, delta):
                """Newton direction from a FRESH shifted f32 factor:
                symmetric-Jacobi equilibration (unit diagonal), a small
                diagonal shift delta (the measured f32-singular leaf
                separator blocks — min eig 8e-9 < eps32 after
                equilibration, tools/probe_f32_direction.py — make the
                UNSHIFTED f32 Cholesky NaN), f32 multifrontal factor at
                MXU-native rate, then f64 PCG on the exact Hessian
                certified at cg_rtol.  Unlike MGB_ND_F32_TMAX (f32
                DIRECT solve, measured-rejected: shallow paths), the
                shift only perturbs the PRECONDITIONER — the accepted
                direction solves the true system to the same tolerance
                as the f64 path, so path honesty is preserved by
                construction.  Spectral intuition: the shift moves the
                few sub-eps32 outlier eigenvalues of the equilibrated
                Hessian to ~delta; CG absorbs isolated outliers in a
                few extra iterations each (same mechanism as
                hostsolve's stale-factor CG).

                With MGB_ND_KRYLOV32=1 the returned `its` scalar is a
                cost-weighted count (f64 its + f32 its/4) so the host
                policy's adaptive attempt cap keeps tracking device
                time, not loop trips."""
                b = -gv[:, :m].T.reshape(-1)
                ndc = cst["nd"]
                dgv = jnp.abs(vals[cst["diag_ids"]])
                s = jax.lax.rsqrt(jnp.maximum(dgv, 1e-300))
                snf = jnp.concatenate(
                    [s.reshape(m, nf), jnp.ones((1, nf), s.dtype)]
                )
                ri = snf.T[:, cst["pair_ia"]][:, None, :]
                cj = snf.T[:, cst["pair_ja"]][None, :, :]
                vals_f = (vals.reshape(nf, nf, -1) * ri * cj).reshape(-1)
                vals_f = vals_f.at[cst["diag_ids"]].add(
                    jnp.asarray(delta, vals_f.dtype)
                )
                if cheap_engine == "df":
                    fac = fz.factor(vals_f, ndc, base_impl="df")
                else:
                    fac = fz.factor(vals_f, ndc, dtype=jnp.float32)

                def apply_fac(r):
                    return s * fz.solve(fac, s * r, ndc).astype(r.dtype)

                bb = jnp.vdot(b, b)
                tol2 = (rtol_r ** 2) * bb
                it32 = jnp.int32(0)
                if k32_on and cheap_engine == "f32":
                    # -- stage 1: f32 PCG in the equilibrated frame ----
                    # Operator = the shifted equilibrated blocks
                    # themselves (delta ~ 3e-6 is invisible at the 1e-4
                    # stage-1 target); true-f32 einsums (one bf16 MXU
                    # pass would floor the stage at ~1e-2).  A stall
                    # window bounds doomed loops near the retirement
                    # boundary, where the f32 floor sits above tol1.
                    with jax.default_matmul_precision("highest"):
                        # vals_f is still f64 (fz.factor casts internally)
                        # — the stage-1 operator needs a real f32 copy or
                        # every matvec silently promotes the loop to f64
                        vals1 = vals_f.astype(jnp.float32)
                        b1 = (s * b).astype(jnp.float32)
                        bb1 = jnp.vdot(b1, b1)
                        tol21 = jnp.asarray(
                            k32_tol * k32_tol, jnp.float32
                        ) * bb1
                        cap1 = 4 * cap

                        def apply1(r):
                            return fz.solve(fac, r, ndc)

                        x1 = apply1(b1)
                        r1 = b1 - matvec(vals1, x1, cst)
                        z1 = apply1(r1)
                        st1 = (
                            x1, r1, z1, jnp.vdot(r1, z1),
                            jnp.vdot(r1, r1), jnp.int32(0),
                            jnp.vdot(r1, r1), jnp.int32(0),
                        )

                        def cond1(st):
                            _, _, _, _, rr, it, _, since = st
                            return (
                                jnp.isfinite(rr)
                                & (rr > tol21)
                                & (it < cap1)
                                & (since < 8)
                            )

                        def body1(st):
                            xv, r, p, rz, rr, it, best, since = st
                            Ap = matvec(vals1, p, cst)
                            pAp = jnp.vdot(p, Ap)
                            ok = (
                                jnp.isfinite(pAp) & (pAp > 0)
                                & jnp.isfinite(rz) & (rz > 0)
                            )
                            al = jnp.where(
                                ok, rz / jnp.where(ok, pAp, 1.0), 0.0
                            )
                            xv = xv + al * p
                            r = r - al * Ap
                            zv = apply1(r)
                            rz2 = jnp.vdot(r, zv)
                            beta = jnp.where(
                                ok & (rz2 > 0),
                                rz2 / jnp.where(ok, rz, 1.0),
                                0.0,
                            )
                            p = jnp.where(ok, zv + beta * p, p)
                            rr2 = jnp.where(ok, jnp.vdot(r, r), jnp.inf)
                            better = rr2 < 0.9 * best
                            best = jnp.where(better, rr2, best)
                            since = jnp.where(better, 0, since + 1)
                            return xv, r, p, rz2, rr2, it + 1, best, since

                        x1, _, _, _, _, it32, _, _ = jax.lax.while_loop(
                            cond1, body1, st1
                        )
                    x0 = s * x1.astype(s.dtype)
                    xv = jnp.where(
                        jnp.all(jnp.isfinite(x0)), x0, jnp.zeros_like(x0)
                    )
                else:
                    xv = apply_fac(b)
                r0 = b - matvec(vals, xv, cst)
                z0 = apply_fac(r0)
                st0 = (xv, r0, z0, jnp.vdot(r0, z0), jnp.vdot(r0, r0),
                       jnp.int32(0))

                def cond(st):
                    _, _, _, _, rr, it = st
                    return jnp.isfinite(rr) & (rr > tol2) & (it < cap)

                def body(st):
                    xv, r, p, rz, rr, it = st
                    Ap = matvec(vals, p, cst)
                    pAp = jnp.vdot(p, Ap)
                    ok = (
                        jnp.isfinite(pAp) & (pAp > 0)
                        & jnp.isfinite(rz) & (rz > 0)
                    )
                    al = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
                    xv = xv + al * p
                    r = r - al * Ap
                    zv = apply_fac(r)
                    rz2 = jnp.vdot(r, zv)
                    beta = jnp.where(
                        ok & (rz2 > 0), rz2 / jnp.where(ok, rz, 1.0), 0.0
                    )
                    p = jnp.where(ok, zv + beta * p, p)
                    rr2 = jnp.where(ok, jnp.vdot(r, r), jnp.inf)
                    return xv, r, p, rz2, rr2, it + 1

                xv, _, _, _, rr, it = jax.lax.while_loop(cond, body, st0)
                rel = jnp.sqrt(jnp.abs(rr) / jnp.maximum(bb, 1e-300))
                rel = jnp.where(jnp.all(jnp.isfinite(xv)), rel, jnp.inf)
                dvp = jnp.concatenate(
                    [xv.reshape(m, nf).T, jnp.zeros((nf, 1), xv.dtype)],
                    axis=1,
                )
                # cost-weighted its (f32 stage-1 its are ~4x cheaper)
                return dvp, it + it32 // 4, rel

            h.update(
                nd_pre=jax.jit(pre),
                nd_step_nodir=jax.jit(step_nodir),
                nd_dir=jax.jit(make_direction(None, n_cg)),
                nd_dir_f=jax.jit(
                    make_direction(None, n_cg, return_fac=True)
                ),
                nd_dir_r=jax.jit(nd_dir_r),
                nd_dir_f32=jax.jit(nd_dir_f32),
            )

            if dtype == jnp.float64:
                # -- fused-gate programs (_run_level_nd_auto) -------------
                # The f32pc certification gate moves ON DEVICE: one jitted
                # program per Newton iteration = post + pre + f32pc attempt
                # + lax.cond(gate failed -> fresh f64 direction), in every
                # regime.  Motivation (round-2/3 measurements): XLA loses
                # ~95ms/it of cross-program fusion at program boundaries
                # (the MGB_ND_LAZY rejection), and the split shape pays one
                # extra serialized ~43ms RTT whenever the host must see the
                # certification scalars before dispatching the f64
                # direction (every endgame iteration).  lax.cond executes
                # only the taken branch on TPU, so a certified cheap step
                # never pays the emulated-f64 factor.  Host policy
                # (cooldown, adaptive cap) still decides `try_cheap` one
                # step ahead — it needs no device data to do so.  The gate
                # quantity and threshold are IDENTICAL to the host form in
                # _run_level_nd_reuse, so accepted directions are exactly
                # as converged; only program packaging changes.
                f64_direction = make_direction(None, n_cg)
                rtol_gate = self.cg_rtol * 1.0001

                def dir_auto(vals, gv, cst, try_cheap, cap, delta):
                    def attempt(_):
                        d32, its, rel = nd_dir_f32(vals, gv, cst, cap,
                                                   delta)
                        ok = rel <= rtol_gate
                        d = jax.lax.cond(
                            ok,
                            lambda dd: dd,
                            lambda dd: f64_direction(vals, gv, cst),
                            d32,
                        )
                        return d, its, rel, ok

                    def direct(_):
                        d = f64_direction(vals, gv, cst)
                        return (
                            d,
                            jnp.int32(0),
                            jnp.zeros((), d.dtype),
                            jnp.asarray(False),
                        )

                    return jax.lax.cond(try_cheap, attempt, direct, None)

                def auto_init(Pl, basis_l, x, w, c, z, t, full_ids, cst,
                              try_cheap, cap, delta):
                    vals, gv, y, cy, fy0 = pre(
                        Pl, basis_l, x, w, c, z, t, full_ids
                    )
                    dvp, its, rel, ok = dir_auto(
                        vals, gv, cst, try_cheap, cap, delta
                    )
                    return gv, y, cy, fy0, dvp, its, rel, ok

                def auto_step(Pl, basis_l, rloc, x, w, c, z, t, y, cy,
                              fy0, gv, dvp, full_ids, cst, try_cheap,
                              cap, delta):
                    z_new, lam2, alpha, dphi = post(
                        Pl, basis_l.idx, rloc, x, w, c, z, t, y, cy,
                        fy0, gv, dvp,
                    )
                    vals2, gv2, y2, cy2, fy02 = pre(
                        Pl, basis_l, x, w, c, z_new, t, full_ids
                    )
                    dvp2, its, rel, ok = dir_auto(
                        vals2, gv2, cst, try_cheap, cap, delta
                    )
                    return (z_new, lam2, alpha, dphi, gv2, y2, cy2,
                            fy02, dvp2, its, rel, ok)

                h.update(
                    nd_init_auto=jax.jit(auto_init),
                    nd_step_auto=jax.jit(auto_step),
                )

                # -- stale-factor endgame program (nd_step_stale) ---------
                # Past t ~ 1e4 the f32 preconditioner stops certifying
                # (eps32*cond >> 1) and every Newton step pays a fresh
                # emulated-f64 factor (~607ms at fem2d L=7 on v5e, the
                # dominant endgame cost).  Observation: the 1e-9 gate is
                # unreachable there by ANY method — the fresh factor's own
                # direct solve achieves relres ~ eps*cond >> cg_rtol and
                # is accepted ungated (the damped line search + stop rule
                # absorb floor-quality directions, linsolve.dense_solve
                # semantics).  So certify the CHEAP direction against the
                # direct method's own measured floor instead: the direct
                # branch returns its achieved relres (one extra matvec),
                # and subsequent steps run PCG preconditioned by the
                # STALE factor, gated at max(cg_rtol, margin*rel_fresh).
                # An accepted stale direction has residual within
                # `margin` of what a fresh factorization would achieve —
                # the same certification quantity at the same floor, for
                # a few ~70ms solve sweeps instead of a ~607ms factor.
                # By self-concordance consecutive endgame Hessians are
                # spectrally close (alpha <= 1 steps of shrinking size),
                # so the stale-preconditioned PCG reaches that floor in
                # O(1) iterations; when it cannot, the in-program
                # lax.cond fallback refactors and re-measures the floor.
                dir_fresh = make_direction(None, n_cg, return_fac=True)

                def _rel_of(vals, gv, dvp, cst):
                    b = -gv[:, :m].T.reshape(-1)
                    xv = dvp[:, :m].T.reshape(-1)
                    r = b - matvec(vals, xv, cst)
                    bb = jnp.vdot(b, b)
                    return jnp.sqrt(
                        jnp.abs(jnp.vdot(r, r))
                        / jnp.maximum(bb, 1e-300)
                    )

                def dir_stale_gate(vals, gv, fac_in, cst, try_cheap, cap,
                                   gate):
                    def fresh(_):
                        d, fac = dir_fresh(vals, gv, cst)
                        relf = _rel_of(vals, gv, d, cst)
                        return (d, jnp.int32(0), jnp.zeros((), d.dtype),
                                jnp.asarray(False), fac, relf)

                    def attempt(_):
                        b = -gv[:, :m].T.reshape(-1)
                        ndc = cst["nd"]

                        def apply_fac(r):
                            return fz.solve(fac_in, r, ndc).astype(
                                r.dtype
                            )

                        bb = jnp.vdot(b, b)
                        tol2 = (gate * gate) * bb
                        xv = apply_fac(b)
                        r0 = b - matvec(vals, xv, cst)
                        zv0 = apply_fac(r0)
                        st0 = (xv, r0, zv0, jnp.vdot(r0, zv0),
                               jnp.vdot(r0, r0), jnp.int32(0))

                        def cnd(st):
                            _, _, _, _, rr, it = st
                            return jnp.isfinite(rr) & (rr > tol2) & (
                                it < cap
                            )

                        def bdy(st):
                            xv, r, p, rz, rr, it = st
                            Ap = matvec(vals, p, cst)
                            pAp = jnp.vdot(p, Ap)
                            okv = (
                                jnp.isfinite(pAp) & (pAp > 0)
                                & jnp.isfinite(rz) & (rz > 0)
                            )
                            al = jnp.where(
                                okv, rz / jnp.where(okv, pAp, 1.0), 0.0
                            )
                            xv = xv + al * p
                            r = r - al * Ap
                            zv = apply_fac(r)
                            rz2 = jnp.vdot(r, zv)
                            beta = jnp.where(
                                okv & (rz2 > 0),
                                rz2 / jnp.where(okv, rz, 1.0),
                                0.0,
                            )
                            p = jnp.where(okv, zv + beta * p, p)
                            rr2 = jnp.where(okv, jnp.vdot(r, r), jnp.inf)
                            return xv, r, p, rz2, rr2, it + 1

                        xv, _, _, _, rr, it = jax.lax.while_loop(
                            cnd, bdy, st0
                        )
                        rel = jnp.sqrt(
                            jnp.abs(rr) / jnp.maximum(bb, 1e-300)
                        )
                        rel = jnp.where(
                            jnp.all(jnp.isfinite(xv)), rel, jnp.inf
                        )
                        okg = rel <= gate
                        dvp_c = jnp.concatenate(
                            [
                                xv.reshape(m, nf).T,
                                jnp.zeros((nf, 1), xv.dtype),
                            ],
                            axis=1,
                        )

                        def keep(_):
                            return (dvp_c, it, rel, jnp.asarray(True),
                                    fac_in, jnp.asarray(-1.0, rel.dtype))

                        def fallback(_):
                            d, its0, rel0, ok0, fac, relf = fresh(None)
                            return d, it, rel, ok0, fac, relf

                        return jax.lax.cond(okg, keep, fallback, None)

                    return jax.lax.cond(try_cheap, attempt, fresh, None)

                def stale_step(Pl, basis_l, rloc, x, w, c, z, t, y, cy,
                               fy0, gv, dvp, full_ids, cst, fac_in,
                               try_cheap, cap, gate):
                    z_new, lam2, alpha, dphi = post(
                        Pl, basis_l.idx, rloc, x, w, c, z, t, y, cy,
                        fy0, gv, dvp,
                    )
                    vals2, gv2, y2, cy2, fy02 = pre(
                        Pl, basis_l, x, w, c, z_new, t, full_ids
                    )
                    dvp2, its, rel, ok, fac, relf = dir_stale_gate(
                        vals2, gv2, fac_in, cst, try_cheap, cap, gate
                    )
                    return (z_new, lam2, alpha, dphi, gv2, y2, cy2,
                            fy02, dvp2, its, rel, ok, fac, relf)

                # zero-filled factor pytree with the production factor's
                # exact structure: seeds fac_in for the first stale-mode
                # step (its try_cheap=False fresh branch ignores it; the
                # lax.cond still requires a structurally valid operand)
                fac_shapes = jax.eval_shape(
                    lambda v, g: dir_fresh(v, g, consts)[1],
                    jax.ShapeDtypeStruct((nf * nf * nuniq,), dtype),
                    jax.ShapeDtypeStruct((nf, m + 1), dtype),
                )
                h.update(
                    nd_step_stale=jax.jit(stale_step),
                    nd_fac_zero=lambda: jax.tree.map(
                        lambda s: jnp.zeros(s.shape, s.dtype), fac_shapes
                    ),
                )
        return h

    def _stop_code(self, tr, kg, lam2, alpha, phi0, theta2, eps):
        """The Newton stop rule, host form — the SINGLE implementation
        shared by every host-driven run_level loop (nd / nd_lazy /
        nd_reuse / host).  Semantics and ordering are exactly the traced
        twin in _build_loop's body; the regime analysis (quadratic-region
        plateau vs damped-region phi floor, patience bound) is documented
        there.  Any semantics change must be applied to BOTH forms — the
        round-1 fake-convergence bug was exactly this class of drift.

        Returns one of DIVERGED/LOCKED/CONVERGED/STALLED/RUNNING; the
        caller still owns the newton_cap bound (CAPPED).
        """
        l2 = tr["lam2"]
        W = self.stall_win
        stall_quad = (
            kg >= 2 * W - 1
            and lam2 <= 0.25
            and min(l2[-W:]) >= 0.95 * min(l2[-2 * W:-W])
        )
        floor = 64.0 * eps * (abs(phi0) + 1.0)
        stall_floor = kg >= 2 and max(
            abs(d) for d in tr["dphi"][-3:]
        ) <= floor
        patience = self.newton_patience
        patient = patience > 0 and kg + 1 >= patience and lam2 <= 25.0
        if not math.isfinite(lam2):
            return self.DIVERGED
        if alpha == 0.0:
            return self.LOCKED
        if lam2 <= theta2:
            return self.CONVERGED
        if stall_quad or stall_floor or patient:
            return self.STALLED
        return self.RUNNING

    def _run_level_nd_lazy(self, level: int, z, t, theta2: float):
        """ND Newton iteration with LAZY direction dispatch
        (MGB_ND_LAZY=1): the fused _run_level_nd program computes the
        NEXT step's direction unconditionally, so every (level, t) run
        throws away one full factorization at its stopping iteration.
        Here the direction program is dispatched only AFTER the host
        has seen the step's stop scalars — same ONE blocking device_get
        per Newton iteration, one extra async dispatch, zero wasted
        factors.  Math identical to _run_level_nd (same pre/post/
        direction programs, just unfused): fem2d L=6 objective and its
        are identical.

        MEASURED-REJECTED on CPU (default 0): fem2d L=6 13.2->13.8s,
        L=7 77->93s — in situ the split executables cost ~95ms/it more
        than the fused program even though isolated microbenches show
        split = fused - 19ms (XLA loses cross-phase fusion/buffer reuse
        at the program boundary), and that swamps the ~13 saved
        stop-iteration factorizations.  Kept as a TPU A/B flag: there
        the saved factor is ~2.4s per (level,t) run vs a ~43ms RTT per
        extra dispatch, a very different trade."""
        h = self._get_nd(level)
        pre_j, step, dir_j = h["nd_pre"], h["nd_step_nodir"], h["nd_dir"]
        full_ids = h["nd_full_ids"]
        cst = h["nd_consts"]
        basis = self._bases[level]
        Pl = self._P[level]
        rloc = basis.rloc
        dtype = z.dtype
        t_arr = jnp.asarray(t, dtype=dtype)
        eps = float(np.finfo(np.asarray(z).dtype).eps)

        import time as _time

        def _retry(fn, *args):
            for attempt in range(3):
                try:
                    return fn(*args)
                except jax.errors.JaxRuntimeError as e:
                    if attempt == 2 or not any(
                        s in str(e) for s in self._RETRYABLE
                    ):
                        raise
                    _time.sleep(10.0 * (attempt + 1))

        tr = {
            key: []
            for key in ("lam2", "alpha", "phi", "dphi", "cy", "cgits", "cgrel")
        }
        code = self.RUNNING
        kg = 0
        vals, gv, y, cy, fy0 = _retry(
            pre_j, Pl, basis, self.x, self.w, self.c, z, t_arr, full_ids
        )
        dvp = _retry(dir_j, vals, gv, cst)
        cyf, fy0f = jax.device_get((cy, fy0))
        while True:
            (z, lam2_d, alpha_d, dphi_d, vals, gv, y, cy, fy0) = _retry(
                step, Pl, basis, rloc, self.x, self.w, self.c, z,
                t_arr, y, cy, fy0, gv, dvp, full_ids,
            )
            lam2_a, alpha_a, dphi_a, cy_a, fy0_a = jax.device_get(
                (lam2_d, alpha_d, dphi_d, cy, fy0)
            )
            lam2, alpha, dphi = float(lam2_a), float(alpha_a), float(dphi_a)
            if os.environ.get("MGB_ND_HEARTBEAT"):
                print(
                    f"# newton L{level} it={kg} lam2={lam2:.3e} "
                    f"alpha={alpha:.3f} wall={_time.time():.1f}",
                    file=sys.stderr,
                    flush=True,
                )
            phi0 = float(t) * float(cyf) + float(fy0f)
            tr["lam2"].append(lam2)
            tr["alpha"].append(alpha)
            tr["phi"].append(phi0)
            tr["dphi"].append(dphi)
            tr["cy"].append(float(cyf))
            tr["cgits"].append(0.0)
            tr["cgrel"].append(0.0)
            cyf, fy0f = cy_a, fy0_a
            code = self._stop_code(tr, kg, lam2, alpha, phi0, theta2, eps)
            kg += 1
            if code != self.RUNNING:
                break
            if kg >= self.newton_cap:
                code = self.CAPPED
                break
            # only reached when another Newton step WILL run: the
            # direction for it is dispatched now (async; never fetched)
            dvp = _retry(dir_j, vals, gv, cst)
        tr_cat = {key: np.asarray(v, np.float64) for key, v in tr.items()}
        return z, kg, code, tr_cat

    def _run_level_nd(self, level: int, z, t, theta2: float):
        """Newton iteration with the on-device direct solver: ONE device
        program per step (line search + assembly + factor + solve), one
        small scalar fetch for the stop logic — no vals/rhs transfers,
        no host factorization.  Stop logic mirrors _run_level_host."""
        if float(t) > float(os.environ.get("MGB_ND_F32_TMAX", "0")):
            # f32pc routes through the fused-gate/reuse runners only for
            # f64 solves (an f32 solve can never certify at cg_rtol —
            # ADVICE r2).  An explicit MGB_ND_REUSE=1 always means the
            # stale-f64-factor leg of the reuse runner.
            if os.environ.get("MGB_ND_REUSE", "0") == "1":
                return self._run_level_nd_reuse(level, z, t, theta2)
            if _f32pc_on() and z.dtype == jnp.float64:
                if os.environ.get("MGB_ND_FUSED_GATE", "1") == "1":
                    return self._run_level_nd_auto(level, z, t, theta2)
                return self._run_level_nd_reuse(level, z, t, theta2)
            if os.environ.get("MGB_ND_LAZY", "0") == "1":
                return self._run_level_nd_lazy(level, z, t, theta2)
        h = self._get_nd(level)
        # Mixed-precision staging (MGB_ND_F32_TMAX > 0): while t <= tmax
        # the factor and triangular sweeps run in float32 and the f64 CG
        # polish recovers direction accuracy.  DEFAULT OFF — measured
        # unusable on these systems: barrier Hessian leaf separator
        # blocks are f32-SINGULAR even mid-path (fem2d L=5 t=1e3: min
        # eigenvalue 8e-9 after symmetric Jacobi equilibration to unit
        # diagonal, below eps32=1.2e-7; see tools/probe_f32_direction.py),
        # so the f32 Cholesky NaNs, the direction degrades to the Jacobi
        # fallback, and the path drifts shallow (fem2d L=6: c_dot_Dz
        # 15.41854 vs exact 15.41832 with 217 vs 141 its).  This is WHY
        # the reference runs f64 MUMPS throughout.  Kept behind the env
        # var with a dynamic escape (any non-converged stop while f32 is
        # active re-initializes with the f64 programs) for future
        # problem classes whose Hessians are f32-regular.
        t32max = float(os.environ.get("MGB_ND_F32_TMAX", "0"))
        use32 = "nd_step32" in h and float(t) <= t32max
        nd_init = h["nd_init32"] if use32 else h["nd_init"]
        nd_step = h["nd_step32"] if use32 else h["nd_step"]
        full_ids = h["nd_full_ids"]
        nd_consts = h["nd_consts"]
        basis = self._bases[level]
        Pl = self._P[level]
        rloc = basis.rloc
        dtype = z.dtype
        t_arr = jnp.asarray(t, dtype=dtype)
        eps = float(np.finfo(np.asarray(z).dtype).eps)

        import time as _time

        def _retry(fn, *args):
            for attempt in range(3):
                try:
                    return fn(*args)
                except jax.errors.JaxRuntimeError as e:
                    if attempt == 2 or not any(
                        s in str(e) for s in self._RETRYABLE
                    ):
                        raise
                    _time.sleep(10.0 * (attempt + 1))

        tr = {
            key: []
            for key in ("lam2", "alpha", "phi", "dphi", "cy", "cgits", "cgrel")
        }
        code = self.RUNNING
        kg = 0
        gv, y, cy, fy0, dvp = _retry(
            nd_init, Pl, basis, self.x, self.w, self.c, z, t_arr,
            full_ids, nd_consts,
        )
        cyf, fy0f = jax.device_get((cy, fy0))
        while True:
            (z, lam2_d, alpha_d, dphi_d, gv, y, cy, fy0, dvp) = _retry(
                nd_step, Pl, basis, rloc, self.x, self.w, self.c, z,
                t_arr, y, cy, fy0, gv, dvp, full_ids, nd_consts,
            )
            lam2_a, alpha_a, dphi_a, cy_a, fy0_a = jax.device_get(
                (lam2_d, alpha_d, dphi_d, cy, fy0)
            )
            lam2, alpha, dphi = float(lam2_a), float(alpha_a), float(dphi_a)
            if os.environ.get("MGB_ND_HEARTBEAT"):
                print(
                    f"# newton L{level} it={kg} lam2={lam2:.3e} "
                    f"alpha={alpha:.3f} wall={_time.time():.1f}",
                    file=sys.stderr,
                    flush=True,
                )
            phi0 = float(t) * float(cyf) + float(fy0f)
            tr["lam2"].append(lam2)
            tr["alpha"].append(alpha)
            tr["phi"].append(phi0)
            tr["dphi"].append(dphi)
            tr["cy"].append(float(cyf))
            tr["cgits"].append(0.0)
            tr["cgrel"].append(0.0)
            cyf, fy0f = cy_a, fy0_a
            code = self._stop_code(tr, kg, lam2, alpha, phi0, theta2, eps)
            kg += 1
            if use32 and code not in (self.RUNNING, self.CONVERGED):
                # f32-factor leg hit its precision floor (or a genuinely
                # hard step): hand over to the f64 programs from the
                # current iterate and keep iterating.
                use32 = False
                nd_step = h["nd_step"]
                gv, y, cy, fy0, dvp = _retry(
                    h["nd_init"], Pl, basis, self.x, self.w, self.c, z,
                    t_arr, full_ids, nd_consts,
                )
                cyf, fy0f = jax.device_get((cy, fy0))
                code = self.RUNNING
                if os.environ.get("MGB_ND_HEARTBEAT"):
                    print(
                        f"# newton L{level} f32->f64 handover at it={kg}",
                        file=sys.stderr,
                        flush=True,
                    )
            if code != self.RUNNING:
                break
            if kg >= self.newton_cap:
                code = self.CAPPED
                break
        tr_cat = {key: np.asarray(v, np.float64) for key, v in tr.items()}
        return z, kg, code, tr_cat

    def _run_level_nd_reuse(self, level: int, z, t, theta2: float):
        """ND Newton iteration with on-device stale-factor reuse
        (MGB_ND_REUSE=1): per step, one fused post+pre device program
        (no factorization) plus one direction program — a fresh
        multifrontal factor only when the stale-factor PCG fails to
        certify the direction at cg_rtol.  Economics and honesty notes
        at the nd_dir_r definition (_get_nd); stop logic mirrors
        _run_level_nd exactly."""
        h = self._get_nd(level)
        pre_j, step = h["nd_pre"], h["nd_step_nodir"]
        dir_f = h["nd_dir_f"]
        # cheap-direction provider: fresh shifted-f32 factor (no
        # staleness; pays an f32 factor per step at MXU rate) beats the
        # stale-f64 factor when both are available.  Gates (ADVICE r2):
        # * an EXPLICIT MGB_ND_REUSE=1 always means the stale-f64-factor
        #   leg — it is the documented A/B flag and must not be silently
        #   redefined by the accelerator f32pc default;
        # * f32pc only for float64 solves: an f32 solve can never certify
        #   at cg_rtol=1e-9, so every attempt would be a doomed waste.
        f32pc = (
            _f32pc_on()
            and ("nd_dir_f32" in h)
            and z.dtype == jnp.float64
            and os.environ.get("MGB_ND_REUSE", "0") != "1"
        )
        dir_cheap = h["nd_dir_f32"] if f32pc else h["nd_dir_r"]
        full_ids = h["nd_full_ids"]
        cst = h["nd_consts"]
        basis = self._bases[level]
        Pl = self._P[level]
        rloc = basis.rloc
        dtype = z.dtype
        t_arr = jnp.asarray(t, dtype=dtype)
        eps = float(np.finfo(np.asarray(z).dtype).eps)
        # upper bound on consecutive reuse steps (hostsolve's stale_cap):
        # the PCG tolerance — not this cap — is the correctness gate; the
        # cap only bounds drift in PCG cost as the factor ages.
        stale_cap = int(os.environ.get("MGB_ND_STALE_CAP", "40"))
        cap_max = int(
            os.environ.get("MGB_ND_REUSE_CAP", "60" if f32pc else "30")
        )
        rtol = self.cg_rtol * 1.0001  # sqrt-rounding slack on the gate

        import time as _time

        def _retry(fn, *args):
            for attempt in range(3):
                try:
                    return fn(*args)
                except jax.errors.JaxRuntimeError as e:
                    if attempt == 2 or not any(
                        s in str(e) for s in self._RETRYABLE
                    ):
                        raise
                    _time.sleep(10.0 * (attempt + 1))

        tr = {
            key: []
            for key in ("lam2", "alpha", "phi", "dphi", "cy", "cgits", "cgrel")
        }
        code = self.RUNNING
        kg = 0
        n_factor = n_reuse = 0
        t_loop0 = _time.perf_counter()
        vals, gv, y, cy, fy0 = _retry(
            pre_j, Pl, basis, self.x, self.w, self.c, z, t_arr, full_ids
        )
        dvp, fac = _retry(dir_f, vals, gv, cst)
        n_factor += 1
        steps_since = 0
        # adaptive attempt budget: ~2x the recent success count (so a
        # doomed attempt near the conditioning floor wastes ~10 cheap
        # solves, not cap_max); two consecutive failures mean the
        # Hessian is changing faster than the factor ages — endgame
        # regime — so reuse is retired for the rest of this run.
        # For f32pc, retirement is softened to an exponential-backoff
        # cooldown (MGB_ND_F32PC_COOLDOWN, 0 = permanent like before):
        # on hardware where an f64 factor costs many times an f32 one
        # (TPU: f64 is software-emulated, f32 runs on the MXU), a
        # periodic cheap retry that usually fails still pays for itself
        # the first time the path re-enters f32pc-certifiable territory.
        cap_now = min(cap_max, 40 if f32pc else 14)
        fail_streak = 0
        cd0 = int(os.environ.get("MGB_ND_F32PC_COOLDOWN", "8"))
        cd_max = 64
        cooldown, cooldown_left = cd0, 0
        delta_pc = jnp.asarray(
            _nd_cheap_delta(),
            jnp.float64 if _nd_cheap_engine() == "df" else jnp.float32,
        )
        cyf, fy0f = jax.device_get((cy, fy0))
        while True:
            (z, lam2_d, alpha_d, dphi_d, vals, gv, y, cy, fy0) = _retry(
                step, Pl, basis, rloc, self.x, self.w, self.c, z,
                t_arr, y, cy, fy0, gv, dvp, full_ids,
            )
            if f32pc and fail_streak >= 2 and cd0 > 0 and cooldown_left == 0:
                # cooled down: grant one retry attempt
                fail_streak = 1
            try_cheap = fail_streak < 2 and (f32pc or steps_since < stale_cap)
            if not try_cheap and cooldown_left > 0:
                cooldown_left -= 1
            if try_cheap:
                if f32pc:
                    dvp, its_d, rel_d = _retry(
                        dir_cheap, vals, gv, cst, jnp.int32(cap_now),
                        delta_pc,
                    )
                else:
                    dvp, its_d, rel_d = _retry(
                        dir_cheap, vals, gv, fac, cst, jnp.int32(cap_now)
                    )
                (lam2_a, alpha_a, dphi_a, cy_a, fy0_a, its_a, rel_a) = (
                    jax.device_get(
                        (lam2_d, alpha_d, dphi_d, cy, fy0, its_d, rel_d)
                    )
                )
                cgits, cgrel = float(its_a), float(rel_a)
                if not (cgrel <= rtol):
                    # stale factor no longer certifies the direction:
                    # discard it (never applied) and refactor
                    dvp, fac = _retry(dir_f, vals, gv, cst)
                    n_factor += 1
                    steps_since = 0
                    fail_streak += 1
                    if fail_streak >= 2:
                        # enter (or extend, with exponential backoff) the
                        # cheap-path cooldown window
                        cooldown_left = cooldown
                        cooldown = min(2 * cooldown, cd_max)
                else:
                    n_reuse += 1
                    steps_since += 1
                    fail_streak = 0
                    cooldown = cd0
                    cap_now = min(cap_max, max(8, 2 * int(cgits) + 4))
            else:
                dvp, fac = _retry(dir_f, vals, gv, cst)
                n_factor += 1
                steps_since = 0
                (lam2_a, alpha_a, dphi_a, cy_a, fy0_a) = jax.device_get(
                    (lam2_d, alpha_d, dphi_d, cy, fy0)
                )
                cgits, cgrel = 0.0, 0.0
            lam2, alpha, dphi = float(lam2_a), float(alpha_a), float(dphi_a)
            if os.environ.get("MGB_ND_HEARTBEAT"):
                print(
                    f"# newton L{level} it={kg} lam2={lam2:.3e} "
                    f"alpha={alpha:.3f} cg={cgits:.0f}/{cgrel:.1e} "
                    f"wall={_time.time():.1f}",
                    file=sys.stderr,
                    flush=True,
                )
            phi0 = float(t) * float(cyf) + float(fy0f)
            tr["lam2"].append(lam2)
            tr["alpha"].append(alpha)
            tr["phi"].append(phi0)
            tr["dphi"].append(dphi)
            tr["cy"].append(float(cyf))
            tr["cgits"].append(cgits)
            tr["cgrel"].append(cgrel)
            cyf, fy0f = cy_a, fy0_a
            code = self._stop_code(tr, kg, lam2, alpha, phi0, theta2, eps)
            kg += 1
            if code != self.RUNNING:
                break
            if kg >= self.newton_cap:
                code = self.CAPPED
                break
        if os.environ.get("MGB_HOST_STATS"):
            print(
                f"# nd-reuse[level={level}] t={t:.3e} its={kg} "
                f"factors={n_factor} reused={n_reuse} "
                f"loop={_time.perf_counter() - t_loop0:.2f}s",
                file=sys.stderr,
            )
        tr_cat = {key: np.asarray(v, np.float64) for key, v in tr.items()}
        return z, kg, code, tr_cat

    def _run_level_nd_auto(self, level: int, z, t, theta2: float):
        """f32pc Newton iteration with the certification gate ON DEVICE
        (MGB_ND_FUSED_GATE=1, the accelerator default): ONE fused device
        program per iteration — post + pre + cheap-direction attempt +
        lax.cond fallback to the fresh f64 factor direction — and one
        blocking scalar device_get.  Two cheap engines, switched by host
        policy within a (level, t) run:

        * f32 (nd_step_auto): fresh shifted-f32 factor preconditioning
          f64 PCG certified at cg_rtol — carries the mid path (t <~ 1e4)
          where eps32*cond << 1.  Gate/threshold identical to
          _run_level_nd_reuse's f32pc mode.
        * stale (nd_step_stale): after the f32 engine fails twice, PCG
          preconditioned by the LAST f64 factor, gated at
          max(cg_rtol, margin*rel_fresh) where rel_fresh is the fresh
          factor's own measured achieved residual — the endgame floor
          certification (rationale at nd_step_stale in _get_nd).

        Stop logic is the shared _stop_code."""
        h = self._get_nd(level)
        init, step = h["nd_init_auto"], h["nd_step_auto"]
        step_stale = h["nd_step_stale"]
        # Cross-stage f32 retirement: the f32 preconditioner's viability
        # boundary is monotone in t (it certifies while eps32 * cond of
        # the equilibrated Hessian stays under the gate, and cond grows
        # with t along the path), so once the engine retires at some t,
        # attempts at later stages of the same level are hopeless — a
        # stage-init attempt alone burned up to cap(40) full ND-solve
        # sweeps (~2.8s on v5e) before failing, at each of the 5 endgame
        # stages.  Recorded per level on the solver-ctx host dict (so a
        # warm second solve on the same geometry skips the doomed
        # attempts from its first endgame stage onward); a rerun at
        # exactly the boundary t also skips — it loses the few cheap
        # its the retiring stage certified, but skips more failures.
        f32_dead_t = h.get("f32_dead_t")
        f32_alive = f32_dead_t is None or float(t) < f32_dead_t
        full_ids = h["nd_full_ids"]
        cst = h["nd_consts"]
        basis = self._bases[level]
        Pl = self._P[level]
        rloc = basis.rloc
        dtype = z.dtype
        t_arr = jnp.asarray(t, dtype=dtype)
        eps = float(np.finfo(np.asarray(z).dtype).eps)
        cheap_df = _nd_cheap_engine() == "df"
        cap_max = int(
            os.environ.get("MGB_ND_REUSE_CAP", "12" if cheap_df else "60")
        )
        rtol = self.cg_rtol * 1.0001
        # stale-factor endgame engine: measured-REJECTED, default OFF —
        # see the MGB_ND_STALE_GATE registry entry (options.py) for the
        # measurement record (the endgame is the damped region; stale
        # factors cannot precondition across alpha ~ 0.02-0.3 steps)
        stale_on = os.environ.get("MGB_ND_STALE_GATE", "0") == "1"
        stale_margin = float(os.environ.get("MGB_ND_STALE_MARGIN", "1.5"))
        stale_cap_max = int(os.environ.get("MGB_ND_STALE_PCG_CAP", "16"))

        import time as _time

        def _retry(fn, *args):
            for attempt in range(3):
                try:
                    return fn(*args)
                except jax.errors.JaxRuntimeError as e:
                    if attempt == 2 or not any(
                        s in str(e) for s in self._RETRYABLE
                    ):
                        raise
                    _time.sleep(10.0 * (attempt + 1))

        tr = {
            key: []
            for key in ("lam2", "alpha", "phi", "dphi", "cy", "cgits", "cgrel")
        }
        code = self.RUNNING
        kg = 0
        n_factor = n_reuse = n_stale = 0
        t_loop0 = _time.perf_counter()
        # host policy state — near the reuse runner's, with the attempt
        # cap adaptive in BOTH directions: successes set it to ~2x the
        # observed cost (mid-path certifications measured 3-28 PCG its
        # depending on level/t), failures HALVE it (each doomed sweep is
        # a full ND solve + matvec of device time, and a failed attempt
        # repeats on the cooldown schedule), floored where a genuine
        # certification could still land.
        # df certifications land in 0-4 sweeps; a tighter cap bounds a
        # doomed attempt at ~cap * (matvec+apply) of device time
        cap_now = min(cap_max, 8 if cheap_df else 40)
        fail_streak = 0
        cd0 = int(os.environ.get("MGB_ND_F32PC_COOLDOWN", "8"))
        cd_max = 64
        cooldown, cooldown_left = cd0, 0
        delta_pc = jnp.asarray(
            _nd_cheap_delta(),
            jnp.float64 if _nd_cheap_engine() == "df" else jnp.float32,
        )
        # stale-engine state (entered when the f32 engine retires)
        engine = "f32"
        fac = None
        rel_fresh = None
        stale_cap = min(stale_cap_max, 10)
        stale_fail = 0
        scd0 = 4
        scd, scd_left = scd0, 0

        def _policy_update(tried, ok, cgits, floorish=None):
            # floorish: True when the step's Newton decrement sits in the
            # near-floor band (stage about to stop).  Certification there
            # fails for a NON-t reason — the relative gate is unattainable
            # against a vanishing gradient — so such failures must not
            # poison the cross-stage retirement record: the FMG warmup
            # pre-converges every coarse level at the first t, the main
            # path re-enters those stages at the floor, and recording
            # dead_t=t_first there killed the f32 engine for the whole
            # path (observed on the v5e L=8 run: warmup level 5 certified
            # 7/7, main path all-f64 from t=0.1).  None (the stage-init
            # solve, no decrement measured yet) is treated like the floor
            # band: the boundary is recorded one step later, from a step
            # that demonstrably failed mid-flight.  In-stage throttling
            # (cooldown, cap halving) applies to every failure as before.
            nonlocal fail_streak, cooldown, cooldown_left, cap_now
            nonlocal n_factor, n_reuse, engine
            if not tried:
                n_factor += 1
                return
            if ok:
                n_reuse += 1
                fail_streak = 0
                cooldown = cd0
                cap_now = min(cap_max, max(8, 2 * int(cgits) + 4))
            else:
                n_factor += 1
                fail_streak += 1
                cap_now = max(10, cap_now // 2)
                if fail_streak >= 2:
                    if floorish is False:
                        # record the retirement boundary for later stages
                        prev = h.get("f32_dead_t")
                        h["f32_dead_t"] = (
                            float(t) if prev is None else min(prev, float(t))
                        )
                    if stale_on:
                        engine = "stale"  # f32 retires for this run
                    else:
                        cooldown_left = cooldown
                        cooldown = min(2 * cooldown, cd_max)

        def _stale_update(tried, ok, cgits, relf):
            nonlocal stale_fail, scd, scd_left, stale_cap
            nonlocal n_factor, n_stale, rel_fresh
            if relf is not None and relf > 0:
                # a fresh factor was computed in-program.  A non-finite
                # or O(1) achieved residual means the UNSHIFTED f64
                # Cholesky went floor-singular and the direction came
                # from the in-program Jacobi fallback — the stored
                # factor is poison as a preconditioner, so retire the
                # stale engine for the rest of this run.
                if not math.isfinite(relf) or relf > 0.5:
                    # attempts stay off until a later healthy factor
                    # (try_cheap requires rel_fresh) — no cooldown churn
                    rel_fresh = None
                else:
                    rel_fresh = relf
            if not tried:
                n_factor += 1
                return
            if ok:
                n_stale += 1
                stale_fail = 0
                scd = scd0
                stale_cap = min(stale_cap_max, max(4, 2 * int(cgits) + 2))
            else:
                n_factor += 1
                stale_fail += 1
                stale_cap = max(4, stale_cap // 2)
                if stale_fail >= 2:
                    scd_left = scd
                    scd = min(2 * scd, 32)

        gv, y, cy, fy0, dvp, its_d, rel_d, ok_d = _retry(
            init, Pl, basis, self.x, self.w, self.c, z, t_arr,
            full_ids, cst, bool(f32_alive), jnp.int32(cap_now), delta_pc,
        )
        cyf, fy0f, its_a, rel_a, ok_a = jax.device_get(
            (cy, fy0, its_d, rel_d, ok_d)
        )
        _policy_update(bool(f32_alive), bool(ok_a), float(its_a))
        # -- pipelined dispatch (MGB_ND_PIPELINE, accelerator default) ----
        # See _nd_pipeline_on.  `state` holds the FUTURES of the current
        # iterate's step inputs; `pending` holds dispatched-but-unread
        # steps (depth <= 2: the one being read + one speculation).  The
        # stale engine (measured-rejected, default off) stays synchronous.
        pipe_on = _nd_pipeline_on() and not stale_on
        n_spec = n_spec_waste = 0
        state = (z, y, cy, fy0, gv, dvp)
        pending = []

        def _dispatch_f32(st):
            # decide THIS step's attempt policy (host state only)
            nonlocal fail_streak, cooldown_left
            if (
                f32_alive
                and fail_streak >= 2
                and cd0 > 0
                and cooldown_left == 0
            ):
                fail_streak = 1  # cooled down: grant one retry
            tc = f32_alive and fail_streak < 2
            if not tc and cooldown_left > 0:
                cooldown_left -= 1
            zz, yy, cc, ff, gg, dd = st
            outs = _retry(
                step, Pl, basis, rloc, self.x, self.w, self.c, zz,
                t_arr, yy, cc, ff, gg, dd, full_ids, cst,
                tc, jnp.int32(cap_now), delta_pc,
            )
            # outs = (z_new, lam2, alpha, dphi, gv2, y2, cy2, fy02,
            #         dvp2, its, rel, ok); next step consumes
            # (z_new, y2, cy2, fy02, gv2, dvp2)
            return outs, tc, (outs[0], outs[5], outs[6], outs[7],
                              outs[4], outs[8])

        def _spec_ok():
            """Conservative continue predictor: speculate iteration k+1
            only while iteration k-1's scalars say the stage is clearly
            mid-flight — every _stop_code trigger needs lam2 <= 0.25
            (quadratic plateau), a floor-band |dphi| (floor stall /
            lock), lam2 <= theta2 (converged), or patience/cap expiry,
            all of which move gradually enough that the previous step's
            scalars front-run them by one iteration.  A misprediction
            costs one discarded device program; predicting "stop" costs
            one un-hidden ~43ms RTT — so the guards are one-sided
            conservative."""
            if kg < 1 or not tr["lam2"]:
                return False
            lam2_p = tr["lam2"][-1]
            if not math.isfinite(lam2_p):
                return False
            if lam2_p <= max(0.25, 4.0 * theta2):
                return False
            if tr["alpha"][-1] <= 0.0:
                return False
            floor_p = 64.0 * eps * (abs(tr["phi"][-1]) + 1.0)
            if abs(tr["dphi"][-1]) <= 4.0 * floor_p:
                return False
            patience = self.newton_patience
            if patience > 0 and kg + 2 >= patience:
                return False
            if kg + 1 >= self.newton_cap:
                return False
            if fail_streak == 1:
                # the in-flight step may retire the f32 engine; a
                # speculated try_cheap=True would burn a doomed attempt
                return False
            return True

        gate = None
        while True:
            if engine == "f32":
                if not pending:
                    outs, tc, state = _dispatch_f32(state)
                    pending.append((outs, tc))
                if pipe_on and len(pending) == 1 and _spec_ok():
                    outs, tc, state = _dispatch_f32(state)
                    pending.append((outs, tc))
                    n_spec += 1
                (z_new, lam2_d, alpha_d, dphi_d, gv2, y2, cy2, fy02,
                 dvp2, its_d, rel_d, ok_d), try_cheap = pending.pop(0)
                (lam2_a, alpha_a, dphi_a, cy_a, fy0_a, its_a, rel_a,
                 ok_a) = jax.device_get(
                    (lam2_d, alpha_d, dphi_d, cy2, fy02, its_d, rel_d,
                     ok_d)
                )
                z = z_new
                cgits, cgrel = float(its_a), float(rel_a)
                # near-floor discriminator (same bands as _spec_ok): a
                # small decrement or floor-band |dphi| marks the stage as
                # about-to-stop, where gate failures carry no viability
                # information
                lam2_f, dphi_f = float(lam2_a), float(dphi_a)
                phi_f = float(t) * float(cy_a) + float(fy0_a)
                floor_f = 64.0 * eps * (abs(phi_f) + 1.0)
                floorish = (
                    not math.isfinite(lam2_f)
                    or lam2_f <= max(0.25, 4.0 * theta2)
                    or abs(dphi_f) <= 4.0 * floor_f
                )
                _policy_update(try_cheap, bool(ok_a), cgits, floorish)
            else:
                if fac is None:
                    fac = h["nd_fac_zero"]()
                # try the stale factor only when one exists (rel_fresh
                # seeded) and the engine is not cooling down after two
                # consecutive certification failures
                if stale_fail >= 2 and scd_left == 0:
                    stale_fail = 1  # cooled down: grant one retry
                try_cheap = rel_fresh is not None and stale_fail < 2
                if not try_cheap and scd_left > 0:
                    scd_left -= 1
                gate = jnp.asarray(
                    max(rtol, stale_margin * (rel_fresh or 0.0)),
                    dtype=dtype,
                )
                zc, yc, cyc, fy0c, gvc, dvpc = state
                (z, lam2_d, alpha_d, dphi_d, gv, y, cy, fy0, dvp,
                 its_d, rel_d, ok_d, fac, relf_d) = _retry(
                    step_stale, Pl, basis, rloc, self.x, self.w,
                    self.c, zc, t_arr, yc, cyc, fy0c, gvc, dvpc,
                    full_ids, cst, fac, try_cheap,
                    jnp.int32(stale_cap), gate,
                )
                state = (z, y, cy, fy0, gv, dvp)
                (lam2_a, alpha_a, dphi_a, cy_a, fy0_a, its_a, rel_a,
                 ok_a, relf_a) = jax.device_get(
                    (lam2_d, alpha_d, dphi_d, cy, fy0, its_d, rel_d,
                     ok_d, relf_d)
                )
                cgits, cgrel = float(its_a), float(rel_a)
                _stale_update(try_cheap, bool(ok_a), cgits,
                              float(relf_a))
            lam2, alpha, dphi = float(lam2_a), float(alpha_a), float(dphi_a)
            if os.environ.get("MGB_ND_HEARTBEAT"):
                gate_s = (
                    f" gate={float(gate):.1e} relf="
                    f"{rel_fresh if rel_fresh is not None else -1:.1e}"
                    if engine == "stale" and gate is not None
                    else ""
                )
                print(
                    f"# newton L{level} it={kg} lam2={lam2:.3e} "
                    f"alpha={alpha:.3f} cg={cgits:.0f}/{cgrel:.1e} "
                    f"eng={engine} try={int(try_cheap)} "
                    f"ok={int(bool(ok_a))}{gate_s} "
                    f"wall={_time.time():.1f}",
                    file=sys.stderr,
                    flush=True,
                )
            phi0 = float(t) * float(cyf) + float(fy0f)
            tr["lam2"].append(lam2)
            tr["alpha"].append(alpha)
            tr["phi"].append(phi0)
            tr["dphi"].append(dphi)
            tr["cy"].append(float(cyf))
            tr["cgits"].append(cgits)
            tr["cgrel"].append(cgrel)
            cyf, fy0f = cy_a, fy0_a
            code = self._stop_code(tr, kg, lam2, alpha, phi0, theta2, eps)
            kg += 1
            if code != self.RUNNING:
                break
            if kg >= self.newton_cap:
                code = self.CAPPED
                break
        # a mispredicted speculation is DISCARDED: `z` is the last
        # completed step's iterate; the in-flight program's outputs are
        # dropped unread (device time wasted, semantics untouched).
        # Drain it before returning: the device executes it either way
        # (the next stage's init would queue behind it), and draining
        # here keeps any runtime fault it raises inside this swallow
        # instead of surfacing at the next stage's un-wrapped
        # device_get (advisor round-3 finding).
        n_spec_waste += len(pending)
        for outs, _tc in pending:
            try:
                jax.block_until_ready(outs)
            except Exception:
                pass  # fault in a discarded program: result never used
        pending.clear()
        if os.environ.get("MGB_HOST_STATS"):
            print(
                f"# nd-auto[level={level}] t={t:.3e} its={kg} "
                f"factors={n_factor} certified={n_reuse} "
                f"stale={n_stale} spec={n_spec}/{n_spec_waste} "
                f"loop={_time.perf_counter() - t_loop0:.2f}s",
                file=sys.stderr,
            )
        tr_cat = {key: np.asarray(v, np.float64) for key, v in tr.items()}
        return z, kg, code, tr_cat

    def _build_host_post(self, level: int):
        """Device half 2: direction contraction, Newton decrement, damped
        backtracking line search, iterate update — identical semantics to
        the tail of _build_step."""
        spec, barrier, ops = self.spec, self.barrier, self.ops
        nf, k = spec.nfields, spec.k
        armijo, max_bt = self.armijo, self.max_backtrack
        ls_full = self.ls_full
        basis = self._bases[level]
        nl, nq = basis.nl, basis.nq

        def post(Pl, idx, rloc, x, w, c, z, t, y, cy, fy0, gv, dvp):
            nelem = Pl.shape[0]
            lam2 = -jnp.vdot(gv, dvp)
            dve = dvp[:, idx]  # (nf, nelem, nl)
            dve_flat = dve.transpose(1, 0, 2).reshape(nelem, nf * nl)
            dY = jnp.einsum("eqjc,ec->eqj", Pl, dve_flat).reshape(-1, k)
            c_dY = jnp.sum(w * jnp.sum(c * dY, axis=1))
            lam = jnp.sqrt(jnp.maximum(lam2, 0.0))
            alpha0 = (
                jnp.ones_like(lam)
                if ls_full
                else jnp.where(lam <= 0.25, 1.0, 1.0 / (1.0 + lam))
            )

            def dphi_of(alpha):
                ya = y + alpha * dY
                dfy = _masked_wsum(w, jax.vmap(barrier)(x, ya)) - fy0
                return t * alpha * c_dY + dfy

            def accept(alpha, dphi):
                return jnp.isfinite(dphi) & (dphi <= -armijo * alpha * lam2)

            def cond(state):
                alpha, dphia, it = state
                return (~accept(alpha, dphia)) & (it < max_bt)

            def body(state):
                alpha, _, it = state
                alpha = alpha * 0.5
                return alpha, dphi_of(alpha), it + 1

            alpha, dphia, bt = jax.lax.while_loop(
                cond, body, (alpha0, dphi_of(alpha0), 0)
            )
            alpha = jnp.where(accept(alpha, dphia), alpha, 0.0)
            dz = jnp.einsum("eqa,fea->eqf", rloc, dve).reshape(z.shape)
            z_new = jnp.where(alpha > 0, z + alpha * dz, z)
            dphi = jnp.where(alpha > 0, dphia, 0.0)
            return z_new, lam2, alpha, dphi

        return post

    def _run_level_host(self, level: int, z, t, theta2: float):
        """Newton iteration for a host-solved level: per step, one device
        kernel to assemble (pre), a host sparse direct/stale-factor solve,
        one device kernel to line-search and update (post).  Stop logic
        mirrors _build_loop exactly, but runs natively on the host (no
        traced history).  On accelerators each device kernel is
        milliseconds — the long-kernel watchdog class of failures does not
        exist on this path."""
        h = self._get_host(level)
        pre, step, solver = h["pre"], h["step"], h["solver"]
        solver.rel_bar = solver.rtol  # see hostsolve._solve bar reset note
        full_ids = h["full_ids"]
        basis = self._bases[level]
        Pl = self._P[level]
        rloc = basis.rloc
        nf, m = self.spec.nfields, basis.m
        dtype = z.dtype
        t_arr = jnp.asarray(t, dtype=dtype)
        eps = float(np.finfo(np.asarray(z).dtype).eps)

        import time as _time

        def _retry(fn, *args):
            for attempt in range(3):
                try:
                    return fn(*args)
                except jax.errors.JaxRuntimeError as e:
                    if attempt == 2 or not any(
                        s in str(e) for s in self._RETRYABLE
                    ):
                        raise
                    _time.sleep(10.0 * (attempt + 1))

        tr = {
            key: []
            for key in ("lam2", "alpha", "phi", "dphi", "cy", "cgits", "cgrel")
        }
        dv_host = None
        code = self.RUNNING
        kg = 0
        # initial assembly at the incoming iterate; afterwards each fused
        # `step` call returns the assembly for the next iterate, and the
        # loop blocks exactly once per Newton iteration (the device_get
        # below fetches the step's scalars AND the next assembly together)
        t_get = t_host = t_disp = 0.0
        vals, gv, y, cy, fy0 = _retry(
            pre, Pl, basis, self.x, self.w, self.c, z, t_arr, full_ids
        )
        vals_np, g_np, cyf, fy0f = jax.device_get((vals, gv, cy, fy0))
        while True:
            tm = _time.perf_counter()
            x_dir, cgits, cgrel = solver.solve(
                np.asarray(vals_np, np.float64),
                -np.asarray(g_np, np.float64).reshape(-1),
                x0=dv_host,
            )
            dv_host = x_dir
            dvp = jnp.asarray(x_dir.reshape(nf, m + 1), dtype=dtype)
            dvp = dvp.at[:, m].set(0.0)
            t_host += _time.perf_counter() - tm
            tm = _time.perf_counter()
            (z, lam2_d, alpha_d, dphi_d, vals, gv, y, cy, fy0) = _retry(
                step, Pl, basis, rloc, self.x, self.w, self.c, z,
                t_arr, y, cy, fy0, gv, dvp, full_ids,
            )
            t_disp += _time.perf_counter() - tm
            tm = _time.perf_counter()
            lam2_a, alpha_a, dphi_a, vals_np, g_np, cy_a, fy0_a = (
                jax.device_get((lam2_d, alpha_d, dphi_d, vals, gv, cy, fy0))
            )
            t_get += _time.perf_counter() - tm
            lam2, alpha, dphi = float(lam2_a), float(alpha_a), float(dphi_a)
            if os.environ.get("MGB_ND_HEARTBEAT"):
                print(
                    f"# newton L{level} it={kg} lam2={lam2:.3e} "
                    f"alpha={alpha:.3f} wall={_time.time():.1f}",
                    file=sys.stderr,
                    flush=True,
                )
            phi0 = float(t) * float(cyf) + float(fy0f)
            tr["lam2"].append(lam2)
            tr["alpha"].append(alpha)
            tr["phi"].append(phi0)
            tr["dphi"].append(dphi)
            tr["cy"].append(float(cyf))
            cyf, fy0f = cy_a, fy0_a
            tr["cgits"].append(float(cgits))
            tr["cgrel"].append(float(cgrel))
            # stop logic (same semantics/order as _build_loop's body)
            code = self._stop_code(tr, kg, lam2, alpha, phi0, theta2, eps)
            kg += 1
            if code != self.RUNNING:
                break
            if kg >= self.newton_cap:
                code = self.CAPPED
                break
        if os.environ.get("MGB_HOST_STATS"):
            print(
                f"# host[level={level}] t={t:.3e} its={kg} "
                f"factors={solver.n_factor} solves={solver.n_solve} "
                f"t_factor={solver.t_factor:.2f}s t_solve={solver.t_solve:.2f}s "
                f"| loop: get={t_get:.2f}s host={t_host:.2f}s disp={t_disp:.2f}s",
                file=sys.stderr,
            )
        tr_cat = {key: np.asarray(v, np.float64) for key, v in tr.items()}
        return z, kg, code, tr_cat

    def _sub_levels(self, level: int):
        """MG-CG hierarchy for `level`: an mg_depth-level cycle (Chebyshev
        smoothing on the upper levels, exact dense solve at the cycle's
        coarsest).  Depth trades per-application op count (each level adds
        fixed per-op latency to EVERY cycle) against cycle strength AND the
        size of the dense coarse factorization (m shrinks 4x per level
        down).  MGB_MG_DEPTH overrides for experiments."""
        mg_depth = int(os.environ.get("MGB_MG_DEPTH", "3"))
        return list(range(max(0, level - (mg_depth - 1)), level + 1))

    def _level_args(self, level: int):
        # pass only the sub-hierarchy's tensors into the kernel: unused
        # operator tensors would still count as live inputs of every
        # compiled level program
        subs = self._sub_levels(level)
        Ps = tuple(self._P[sl] for sl in subs)
        bases = tuple(self._bases[sl] for sl in subs)
        embeds = tuple(self._embeds[sl] for sl in subs[:-1])
        rloc = self._bases[level].rloc
        return Ps, bases, embeds, rloc

    # -- public -------------------------------------------------------------

    def step(self, level: int, z, t):
        if level not in self._steps:
            raw = self._build_step(level)
            self._steps[level] = (jax.jit(raw), raw.n_smooth)
        fn, n_smooth = self._steps[level]
        Ps, idxs, embeds, rloc = self._level_args(level)
        nf, m = self.spec.nfields, self._bases[level].m
        out = fn(
            Ps,
            idxs,
            embeds,
            rloc,
            self.x,
            self.w,
            self.c,
            z,
            jnp.asarray(t, dtype=z.dtype),
            jnp.zeros(n_smooth, dtype=z.dtype),
            jnp.asarray(self.cg_rtol, dtype=z.dtype),
            jnp.zeros((nf, m + 1), dtype=z.dtype),
            self._get_mgcg_ndcoarse(level)[1],
        )
        return out[:6]

    # transient infrastructure failures worth retrying: the remote compile
    # service can drop the HTTP response mid-body under load (seen at L=8:
    # "read body: response body closed before all bytes were read")
    _RETRYABLE = ("remote_compile", "read body", "UNAVAILABLE", "RESOURCE_EXHAUSTED")

    def run_level(self, level: int, z, t, theta2: float):
        """Run the full Newton iteration at `level` in device chunks of
        `newton_chunk` iterations (see _build_loop); returns
        (z, its, stop_code, traces) with one host sync per chunk.  Fine
        levels route to the host sparse direct solver (_run_level_host)."""
        if self._nd_enabled(level):
            # Endgame handoff to the host direct solver (MGB_HOST_TMIN,
            # default off): for t >= tmin the Newton direction comes from
            # host SuperLU (true IEEE f64 + iterative refinement,
            # solver/hostsolve.py) instead of the on-device ND factor.
            # Motivation (round-5 L=8 measurement, artifacts/
            # BENCH_L8_tpu_r5_inv0.json): the v5e's software-f64 factor
            # kernels hit a precision wall at t >= 1e6 at L=8 scale —
            # the path freezes ~5.6e-5 rel above the CPU truth with BOTH
            # factor application modes, while the CPU's LAPACK/SuperLU
            # f64 descends to 6.3963937825.  Only the last ~2-3 stages
            # (~30-40 its) pay host factor costs; every earlier stage
            # keeps the on-device engines.  CPU-validated: L=6 with
            # tmin=1e6 lands on the exact objective (the host and ND
            # directions are interchangeable where both are accurate).
            tmin = float(os.environ.get("MGB_HOST_TMIN", "0") or 0.0)
            if tmin > 0.0 and float(t) >= tmin:
                return self._run_level_host(level, z, t, theta2)
            return self._run_level_nd(level, z, t, theta2)
        if self._host_enabled(level):
            return self._run_level_host(level, z, t, theta2)
        if level not in self._loops:
            raw_loop = self._build_loop(level)
            n_smooth = max(1, len(self._sub_levels(level)) - 1)
            self._loops[level] = (raw_loop, n_smooth)
        loop, n_smooth = self._loops[level]
        Ps, idxs, embeds, rloc = self._level_args(level)
        import time as _time

        HIST = max(5, 2 * self.stall_win - 1)
        dtype = z.dtype
        t_arr = jnp.asarray(t, dtype=dtype)
        th_arr = jnp.asarray(theta2, dtype=dtype)
        lmax = jnp.zeros(n_smooth, dtype=dtype)
        nf = self.spec.nfields
        m = self._bases[level].m
        dv = jnp.zeros((nf, m + 1), dtype=dtype)
        hist = {
            key: jnp.zeros(HIST, dtype=dtype)
            for key in (
                "lam2", "alpha", "phi", "dphi", "cy", "cgits", "cgrel"
            )
        }
        total = 0
        code = self.RUNNING
        parts = []
        while True:
            for attempt in range(3):
                try:
                    z, its, code, tr, lmax, hist, dv = loop(
                        Ps,
                        idxs,
                        embeds,
                        rloc,
                        self.x,
                        self.w,
                        self.c,
                        z,
                        t_arr,
                        th_arr,
                        lmax,
                        hist,
                        jnp.asarray(total, jnp.int32),
                        dv,
                        self._get_mgcg_ndcoarse(level)[1],
                    )
                    break
                except jax.errors.JaxRuntimeError as e:
                    msg = str(e)
                    if attempt == 2 or not any(
                        s in msg for s in self._RETRYABLE
                    ):
                        raise
                    _time.sleep(10.0 * (attempt + 1))
            its, code = int(its), int(code)
            tr_host = jax.device_get(tr)
            parts.append(
                {key: v[HIST : HIST + its] for key, v in tr_host.items()}
            )
            total += its
            if code != self.RUNNING:
                break
            if total >= self.newton_cap:
                code = self.CAPPED
                break
        tr_cat = {
            key: np.concatenate([p[key] for p in parts])
            for key in parts[0]
        }
        return z, total, code, tr_cat

    def warmup(self, z, t, theta2: float = 0.0625):
        """Compile every level's Newton-loop kernel concurrently.

        XLA compilation happens per level; issuing the first call of each
        level from its own thread overlaps the compiles (the GIL is
        released while XLA works), which matters when compilation is
        remote/slow.  The discarded results cost a handful of redundant
        Newton iterations of device time."""
        if self._warmed:
            return
        self._warmed = True

        levels = list(range(self.levels))
        # The shared remote TPU worker crashes under CONCURRENT first
        # executions/compiles of large level kernels ("kernel fault",
        # reproducible at L=7 with 4 warmup threads; every level passes
        # serially — tools/probe_levels_tpu.py).  Warm up serially on
        # non-CPU backends; threaded warmup remains for local CPU where
        # compile overlap is safe and tests benefit.
        serial = (
            len(levels) <= 1
            or os.environ.get("MGB_SERIAL_WARMUP")
            or jax.default_backend() != "cpu"
        )
        if serial:
            for lvl in levels:
                self.run_level(lvl, z, t, theta2)
            return
        import concurrent.futures as cf

        # bounded concurrency: unbounded parallel compiles overload the
        # remote compile service at large L (dropped responses at L=8)
        workers = min(
            len(levels), int(os.environ.get("MGB_WARMUP_THREADS", "4"))
        )
        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            futs = [
                ex.submit(self.run_level, lvl, z, t, theta2)
                for lvl in levels
            ]
            for f in futs:
                f.result()

    def evaluate(self, z, t):
        return self._eval(self.x, self.w, self.c, z, jnp.asarray(t, dtype=z.dtype))


# ----------------------------------------------------------------------------
# Path following
# ----------------------------------------------------------------------------


def _path_follow(
    ctx: _SolverCtx,
    z,
    t0: float,
    t_end: float,
    kappa: float,
    maxit: int,
    theta: float,
    final_lam2: float,
    early_stop: Optional[Callable] = None,
    verbose: bool = False,
    logfile=None,
    phase: str = "main",
    start_fine: bool = False,
):
    L = ctx.levels
    its = np.zeros(L, dtype=np.int64)
    ts, c_dots, log = [], [], []
    total = 0
    t_start = time.perf_counter()
    t = float(t0)
    user_kappa = float(kappa)
    kap = user_kappa

    def emit(msg):
        if verbose:
            print(msg)
        if logfile is not None:
            print(msg, file=logfile)

    converged = True
    locked_levels = set()  # levels locked at an earlier t: skip henceforth
    # FMG-style sweeping: the full coarse-to-fine Newton sweep is what
    # brings the initial iterate onto the central path cheaply; once
    # path-following is underway the MG-CG preconditioner already carries
    # the coarse-grid correction inside each fine linear solve, so coarse
    # *Newton* sweeps are redundant work (and at large t actively harmful,
    # see the lock semantics below).  After the first successful t-step we
    # run the finest level only, re-enabling the full sweep as the first
    # escalation if a t-step fails.
    use_coarse = not start_fine
    retry_stage = 0
    # Path extrapolation (predictor): the central path is z(t) = z* + a/t
    # + O(1/t^2), so two converged iterates determine the next start to
    # second order: z_pred = z2 + gamma (z2 - z1) with
    # gamma = (1/t3 - 1/t2)/(1/t2 - 1/t1) — Richardson extrapolation in
    # 1/t, no linear solve needed.  MEASURED-REJECTED as a default
    # (fem2d L=4/L=5): the extrapolated start sits near the cone
    # boundary at low-weight quadrature rows, where even feasibility-
    # and descent-guarded predictions (finite phi, phi decreased, 0.8
    # safety backoff) wedge the damped line search — the fine level
    # LOCKS prematurely and the path stops 1.6e-3 short of the true
    # objective (50.61967 vs 50.61808), while accepted iteration savings
    # are nil.  The knob remains for barrier problems with fat margins.
    predict = os.environ.get("MGB_PREDICT", "0") == "1"
    z_conv_prev = t_conv_prev = None  # converged pair behind the current t
    z_conv_cur = None  # converged iterate at the last completed t
    ctx.warmup(z, t, theta ** 2)
    while True:
        ts.append(t)
        z_backup = z if z_conv_cur is None else z_conv_cur
        its_backup = its.copy()
        locked_backup = set(locked_levels)
        ok = True
        for lvl in range(L):
            if lvl < L - 1 and (not use_coarse or lvl in locked_levels):
                continue
            # the whole Newton iteration at this level runs inside one jit
            # (stop-code semantics: CONVERGED lam2<=theta^2; LOCKED = line
            # search certifies no measurable-progress step exists — at
            # large t the margins (~1/t) sit at the f64 cancellation floor,
            # a wall any double-precision implementation shares, so the
            # iterate is centered to working precision; STALLED = decrement
            # floor reached; DIVERGED/CAPPED = reject the t-step)
            z, nits, code, tr = ctx.run_level(lvl, z, t, theta ** 2)
            its[lvl] += nits
            total += nits
            for i in range(nits):
                log.append(
                    dict(
                        phase=phase,
                        t=t,
                        level=lvl,
                        lam2=float(tr["lam2"][i]),
                        alpha=float(tr["alpha"][i]),
                        phi=float(tr["phi"][i]),
                        dphi=float(tr["dphi"][i]),
                        cgits=int(tr["cgits"][i]),
                        cgrel=float(tr["cgrel"][i]),
                    )
                )
            if total > maxit:
                raise AMGBConvergenceFailure(
                    f"amgb: exceeded maxit={maxit} Newton iterations"
                )
            if code == _SolverCtx.LOCKED:
                locked_levels.add(lvl)
            if code in (_SolverCtx.DIVERGED, _SolverCtx.CAPPED):
                ok = False
                break

        if not ok:
            z = z_backup
            its = its_backup
            # locks taken during the rejected sweep belong to the
            # too-aggressive t; a level locked there can still contribute at
            # the smaller retried t, so roll the lock set back too
            locked_levels = locked_backup
            ts.pop()
            t_prev = ts[-1] if ts else t0
            retry_stage += 1
            if retry_stage == 1:
                # escalation 1: flip the sweep strategy for this t —
                # fine-only runs get a rescue full sweep (nonlinearity the
                # finest level can't absorb alone); full sweeps retry
                # fine-only (late-path coarse steps can wedge the finest
                # level against the boundary)
                use_coarse = not use_coarse
                emit(
                    f"[amgb:{phase}] step rejected; retrying t={t:.3e} "
                    f"with {'full sweep' if use_coarse else 'finest level only'}"
                )
                continue
            # escalation 2: adaptive barrier stepping — halve the step in
            # log space (reference `kappa` semantics,
            # docs/src/guide.md:148-152).
            if kap <= 1.0 + 1e-9 or t <= t_prev * (1 + 1e-12):
                raise AMGBConvergenceFailure(
                    f"amgb: Newton failed to converge at t={t} "
                    f"(phase={phase}) with minimal step"
                )
            kap = math.sqrt(kap)
            t = min(t_prev * kap, t_end)
            emit(f"[amgb:{phase}] step rejected; kappa -> {kap:.3f}, retry t={t:.3e}")
            continue

        # c.Dz at the last Newton evaluation of this t (the reference's
        # per-t c_dot_Dz log field; avoids an extra device round-trip)
        cy_last = float(tr["cy"][max(nits - 1, 0)]) if nits else float(
            ctx.evaluate(z, t)[1]
        )
        c_dots.append(cy_last)
        emit(
            f"[amgb:{phase}] t={t:.4e} its={its.tolist()} c_dot_Dz={cy_last:.10e}"
        )
        # FMG hand-off: from now on the finest level does the Newton work,
        # coarse corrections ride inside its MG-CG preconditioner
        use_coarse = False
        retry_stage = 0

        if early_stop is not None and early_stop(z):
            break
        if t >= t_end * (1 - 1e-12):
            break
        t_done = t
        kap = min(user_kappa, kap * kap) if kap < user_kappa else user_kappa
        t = min(t_done * kap, t_end)
        z_done = z  # converged iterate at t_done
        # predictor: extrapolate the converged pair (z_prev@t_prev,
        # z_done@t_done) to the new t; guarded by feasibility AND
        # non-increase of the new barrier potential (gamma halves toward
        # the plain warm start gamma = 0)
        if predict and z_conv_prev is not None:
            # 0.8 safety: the full extrapolation aims AT z(t_new), whose
            # boundary margins are ~1/kappa of the current ones, so the
            # O(1/t^2) extrapolation error can land ON the cone boundary
            # (measured at fem2d L=4: a full-gamma prediction wedged one
            # low-weight quadrature row outside the cone, locking the
            # path 2.7e-3 short).  Backing off keeps a margin cushion of
            # ~(1-safety)*current while still removing most of the warm-
            # start error.
            gam = 0.8 * (1.0 / t - 1.0 / t_done) / (
                1.0 / t_done - 1.0 / t_conv_prev
            )
            dz_path = z_done - z_conv_prev
            phi_base = float(ctx.evaluate(z_done, t)[0])
            for _ in range(3):
                z_try = z_done + gam * dz_path
                phi_try = float(ctx.evaluate(z_try, t)[0])
                if os.environ.get("MGB_PREDICT_DEBUG"):
                    emit(
                        f"[amgb:{phase}] predict t={t:.3e} gam={gam:.4f} "
                        f"phi_base={phi_base:.10e} phi_try={phi_try:.10e} "
                        f"accept={math.isfinite(phi_try) and phi_try <= phi_base}"
                    )
                if math.isfinite(phi_try) and phi_try <= phi_base:
                    z = z_try
                    break
                gam *= 0.5
        z_conv_prev, t_conv_prev = z_done, t_done
        z_conv_cur = z_done

    # Final polish at the finest level: fully center at t_end so that
    # independent runs (1 vs N devices) agree to Newton tolerance
    # (the reference's 1e-10 MPI-vs-native invariant, test/test_quick.jl:137).
    # If the fine level's t_end stage already ended AT the arithmetic
    # floor (STALLED plateau or LOCKED line search), re-running the
    # identical computation with a tighter lam2 target cannot move the
    # iterate — the polish just burns >= 2W iterations re-detecting the
    # same floor because the stall windows restart with fresh history
    # (measured at fem2d L=7 on v5e: 7-9 polish its, lam2 plateau
    # unchanged at ~0.06, ~6-8s of wall).  Only a CONVERGED stage
    # (lam2 <= theta^2 with room down to final_lam2) can be centered
    # further, so only that case polishes.
    if early_stop is None:
        if code in (_SolverCtx.STALLED, _SolverCtx.LOCKED):
            emit(
                f"[amgb:{phase}] final polish skipped: fine level already "
                f"at the arithmetic floor (code={code})"
            )
        else:
            emit(
                f"[amgb:{phase}] final polish t={t:.4e} "
                f"target lam2={final_lam2:.3e}"
            )
            # The polish starts from a CONVERGED iterate (lam2 <= theta^2)
            # and its centering gain is captured in the first 1-2 steps
            # (lam2 0.25 -> the ~0.06 arithmetic floor); everything after
            # is floor noise until the stall windows fire (measured fem2d
            # L=7 v5e: polish lam2 trace 0.062, 0.061, 0.068, ... for 7-9
            # its).  c_dot_Dz is recorded per t-stage BEFORE the polish,
            # so a tight cap changes only how long the floor is ground,
            # never the reported objective.  The cap is host-side state —
            # no program reshaping (the traced loops bound only the chunk).
            cap_save = ctx.newton_cap
            ctx.newton_cap = min(cap_save, max(4, 2 * ctx.stall_win))
            try:
                z_new, nits, code, tr = ctx.run_level(
                    L - 1, z, t, final_lam2
                )
            finally:
                ctx.newton_cap = cap_save
            emit(f"[amgb:{phase}] polish done its={nits} code={code}")
            if code != _SolverCtx.DIVERGED:
                z = z_new
                its[L - 1] += nits

    t_elapsed = time.perf_counter() - t_start
    return z, PhaseLog(
        t_elapsed=t_elapsed,
        ts=ts,
        its=its,
        c_dot_Dz=c_dots,
        t_begin=float(t0),
        t_end=float(t),
        converged=converged,
    ), log


# ----------------------------------------------------------------------------
# amgb entry point
# ----------------------------------------------------------------------------


def _f32_twin(geometry: Geometry) -> Geometry:
    """Memoized float32 re-homing of an f64 geometry (mixed-precision path
    following).  Cached on the geometry so the f32 twin's _ctx_cache — and
    with it every compiled f32 level kernel — survives across amgb calls."""
    tw = getattr(geometry, "_f32_twin_cache", None)
    if tw is None:
        # dense_threshold=0: in f32 the dense Cholesky falls apart at the
        # path conditioning the leg reaches (cond ~ t >> 1/eps32 scaled),
        # handing off garbage directions; MG-CG's best-iterate tracking
        # stays robust there, so every level above the coarsest solves
        # iteratively in the f32 leg.
        tw = geometry.with_backend(
            geometry.backend.replace(dtype=jnp.float32, dense_threshold=0)
        )
        geometry._f32_twin_cache = tw
    return tw


def _merge_phase_logs(a: PhaseLog, b: PhaseLog) -> PhaseLog:
    return PhaseLog(
        t_elapsed=a.t_elapsed + b.t_elapsed,
        ts=list(a.ts) + list(b.ts),
        its=a.its + b.its,
        c_dot_Dz=list(a.c_dot_Dz) + list(b.c_dot_Dz),
        t_begin=a.t_begin,
        t_end=b.t_end,
        converged=a.converged and b.converged,
    )


def _get_ctx(geometry, spec, barrier, c, **kw):
    """Geometry-attached _SolverCtx cache.

    Jitted level kernels are closures over (spec, barrier); rebuilding them
    per amgb call would re-trace and re-compile every level (painful on
    TPU where a compile round-trips the tunnel).  Keyed by everything that
    shapes the compiled graph; traced values (c, x contents, z) are
    call-time arguments."""
    cache = getattr(geometry, "_ctx_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(geometry, "_ctx_cache", cache)
    x = kw.get("x")
    # key on the linear_solver callable itself (hashable, and holding it in
    # the key keeps a strong reference — keying on id() would let GC recycle
    # the id and silently alias a context compiled for a different solver)
    # every program-shaping MGB_* knob participates via the SolverOptions
    # snapshot (options.py): flipping e.g. MGB_ND_LEAF between solves on
    # the same geometry gets a fresh context (new symbolic factorization,
    # new kernels) instead of silently reusing stale state
    from ..options import SolverOptions

    key = (
        spec,
        barrier,
        kw.get("subspace", "dirichlet"),
        kw.get("linear_solver"),
        kw.get("newton_cap", 50),
        SolverOptions.from_env(),
        None if x is None else x.shape[1],
    )
    ctx = cache.get(key)
    if ctx is None:
        ctx = _SolverCtx(geometry, spec, barrier, c, **kw)
        cache[key] = ctx
    else:
        # mirror x: re-shard call-time arrays so a cached context always
        # feeds its level kernels operands with the placement they were
        # compiled for (a replicated c on a meshed backend would force XLA
        # to recompile/reshard every level kernel on repeat solves)
        ctx.c = c if ctx.backend.mesh is None else ctx.backend.shard_rows(c)
        if x is not None:
            ctx.x = x if ctx.backend.mesh is None else ctx.backend.shard_rows(x)
    return ctx


def amgb(
    geometry: Geometry,
    *,
    D=None,
    f: Optional[Callable] = None,
    g: Optional[Callable] = None,
    Q: Optional[Convex] = None,
    p=1.0,
    t: float = 0.1,
    tol: Optional[float] = None,
    kappa: float = 10.0,
    maxit: int = 10000,
    verbose: bool = False,
    logfile=None,
    subspace: str = "dirichlet",
    linear_solver: Optional[Callable] = None,
    newton_cap: int = 200,
    aux=None,
    z0=None,
    mixed: Optional[bool] = None,
    **_ignored,
):
    """Solve the barrier problem on `geometry`.

    Mirrors the reference signature amgb(geometry; p, tol, maxit, verbose,
    logfile, D, f, g) (docs/src/guide.md:148-152); like the reference entry
    points, unknown keyword arguments are tolerated and ignored
    (src/MultiGridBarrierMPI.jl:594-600 splats the same kwargs into both the
    geometry builder and amgb).
    """
    dim = geometry.dim
    dtype = geometry.x.dtype
    if tol is None:
        tol = float(np.sqrt(np.finfo(dtype).eps))

    spec = _normalize_D(D if D is not None else default_D(dim))
    ffun = f if f is not None else default_f(dim, dtype)
    gfun = g if g is not None else default_g(dim, dtype)
    Qset = Q if Q is not None else default_Q(dim, p)

    x, w = geometry.x, geometry.w
    if aux is not None:
        # Extra per-row data columns (e.g. the previous time snapshot in the
        # parabolic driver); appended to x for all pointwise callables, so
        # barrier/f/g receive rows of [coords, aux].
        x = jnp.concatenate([x, jnp.asarray(aux, dtype=dtype)], axis=1)
    c = jax.vmap(lambda xi: jnp.asarray(ffun(xi), dtype=dtype))(x)
    if z0 is None:
        z0 = jax.vmap(lambda xi: jnp.asarray(gfun(xi), dtype=dtype))(x)
    else:
        z0 = jnp.asarray(z0, dtype=dtype)
    z0 = geometry.backend.shard_rows(z0)
    if c.shape[1] != spec.k:
        raise ValueError(f"f(x) must return {spec.k} components, got {c.shape[1]}")
    if z0.shape[1] != spec.nfields:
        raise ValueError(
            f"g(x) must return {spec.nfields} components, got {z0.shape[1]}"
        )

    t_end = 1.0 / tol
    log = []

    # ---- Phase 1: feasibility --------------------------------------------
    ops = geometry.operators
    y0 = _apply_D(ops, spec, z0)
    barrier0 = jnp.sum(w * jax.vmap(Qset.barrier)(x, y0))
    # strict interiority <=> finite barrier (-log margin); the slack()
    # convention carries a +1 comfort margin that must NOT gate the skip —
    # a converged (near-boundary) iterate passed back in as z0 is feasible
    feasible = bool(jnp.isfinite(barrier0))

    if feasible:
        z = z0
        SOL_feasibility = PhaseLog(
            t_elapsed=0.0,
            ts=[],
            its=np.zeros(geometry.levels, dtype=np.int64),
            c_dot_Dz=[],
            t_begin=t,
            t_end=t,
            converged=True,
        )
    else:
        # Augmented ("combined phase-1") problem: extra field e with D row
        # ('_e','id'), objective sum w*(c.Dz + M*e), barrier = cobarrier.
        # Keeping the original cost is essential: with a cost on e alone the
        # phase-1 objective is UNBOUNDED BELOW (the barrier's -log(s) terms
        # reward sending slack fields to infinity at zero cost) and Newton
        # descends forever.  M makes infeasibility-reduction dominate.
        spec_aug = DSpec(
            entries=spec.entries + ((spec.nfields, "id"),),
            fieldnames=spec.fieldnames + ("_feas_slack",),
        )
        M = 10.0 * (1.0 + float(jnp.max(jnp.abs(c))))
        c_aug = jnp.concatenate(
            [c, jnp.full((c.shape[0], 1), M, dtype=dtype)], axis=1
        )
        e0 = jax.vmap(Qset.slack)(x, y0)
        # lift uniformly so e is comfortably interior pointwise
        z0_aug = jnp.concatenate([z0, e0[:, None]], axis=1)

        co_barrier = _co_barrier_for(Qset, spec.k)

        ctx1 = _get_ctx(
            geometry,
            spec_aug,
            co_barrier,
            c_aug,
            subspace=subspace,
            linear_solver=linear_solver,
            x=x,
            newton_cap=newton_cap,
        )

        def feasible_now(z_aug):
            y = _apply_D(ops, spec, z_aug[:, : spec.nfields])
            sl = jax.vmap(Qset.slack)(x, y)
            fin = jnp.isfinite(jnp.sum(jax.vmap(Qset.barrier)(x, y)))
            return bool(jnp.max(sl) < -1e-8) and bool(fin)

        z_aug, SOL_feasibility, log1 = _path_follow(
            ctx1,
            z0_aug,
            t,
            t_end,
            kappa,
            maxit,
            theta=0.25,
            final_lam2=tol,
            early_stop=feasible_now,
            verbose=verbose,
            logfile=logfile,
            phase="feasibility",
        )
        log.extend(log1)
        if not feasible_now(z_aug):
            raise AMGBConvergenceFailure("amgb: feasibility phase failed")
        z = z_aug[:, : spec.nfields]

    # ---- Phase 2: main ------------------------------------------------------
    # Mixed-precision path following (TPU lever: f64 is software-emulated on
    # the v5e VPU/MXU while f32 runs at native rate and half the HBM bytes).
    # The early central path needs no f64: at t <= t_switch the barrier
    # margins are ~1/t, comfortably above f32 eps, and the
    # path-following iterates only need theta-centering (lam <= 0.25).  So
    # the t <= t_switch leg runs entirely in float32 and hands its iterate
    # to the f64 context, which re-centers (a couple of Newton steps) and
    # finishes the path to t_end = 1/tol at the full f64 contract.  The
    # final solution accuracy is set by the f64 endgame alone.
    if mixed is None:
        # DEFAULT OFF.  With the quadratic-model CG (honest convergence)
        # the handoff recentering costs MORE f64 Newton iterations than the
        # f32 leg saves (measured fem2d L=6: mixed 305 f64 fine its landing
        # 4e-4 off, vs pure 268) — the f32 leg's centering error is too
        # large for the endgame to absorb cheaply.  Opt in explicitly with
        # mixed=True or MGB_F32_EARLY=1; the engagement preconditions below
        # still apply.
        m_fine = geometry.bases[subspace][-1].m
        mixed = (
            dtype == jnp.float64
            and linear_solver is None
            and spec.nfields * m_fine > geometry.backend.dense_threshold
            and os.environ.get("MGB_F32_EARLY", "0") == "1"
        )
    # Switch point: constraint margins along the path are ~1/t, so t = 1e5
    # keeps the f32 leg ~100x above f32 eps (1.2e-7).  Measured on fem2d
    # L=5: t_switch=1e5 leaves only ~8 f64 fine-level Newton steps (vs 43
    # in a pure-f64 run) at +4 total iterations and objective agreement at
    # the duality-gap scale (~1e-5 relative).
    t_switch = float(os.environ.get("MGB_T_SWITCH", "1e5")) if mixed else 0.0
    SOL_early = None
    t_orig, z_orig = t, z
    if mixed and t < t_switch and t_end > 10.0 * t_switch:
        g32 = _f32_twin(geometry)
        x32 = x.astype(jnp.float32)
        ctx32 = _get_ctx(
            g32,
            spec,
            Qset.barrier,
            c.astype(jnp.float32),
            subspace=subspace,
            x=x32,
            newton_cap=newton_cap,
        )
        z_pre = z  # strictly feasible phase-2 entry iterate (fallback anchor)
        try:
            z32, SOL_early, log_a = _path_follow(
                ctx32,
                jnp.asarray(z, dtype=jnp.float32),
                t,
                t_switch,
                kappa,
                maxit,
                theta=0.25,
                final_lam2=0.0625,
                verbose=verbose,
                logfile=logfile,
                phase="main",
            )
            z64 = jnp.asarray(z32, dtype=dtype)
            # Handoff feasibility guard: margins at t_switch are ~1/t_switch,
            # the same order as f32 rounding noise on O(1) cone rows, so the
            # cast iterate can land (barely) OUTSIDE the cone, where the f64
            # barrier is NaN and every Newton step diverges.  The margin
            # (slack) is concave, so blending toward the strictly feasible
            # entry iterate re-enters the interior for small violations.
            def _feasible64(zz):
                yy = _apply_D(ops, spec, zz)
                return bool(
                    jnp.isfinite(
                        _masked_wsum(w, jax.vmap(Qset.barrier)(x, yy))
                    )
                )

            for theta_blend in (0.0, 1e-4, 1e-3, 1e-2, 1e-1):
                z_try = (
                    z64
                    if theta_blend == 0.0
                    else (1.0 - theta_blend) * z64 + theta_blend * z_pre
                )
                if _feasible64(z_try):
                    z = geometry.backend.shard_rows(z_try)
                    t = t_switch
                    log.extend(log_a)
                    maxit = max(maxit - int(SOL_early.its.sum()), 100)
                    break
            else:
                SOL_early = None  # unrecoverable cast: full-f64 path
        except AMGBConvergenceFailure:
            # f32 leg hit its precision floor early: restart the full-f64
            # path from the original iterate (correctness over speed)
            SOL_early = None
        if SOL_early is None:
            z = z_pre
    ctx2 = _get_ctx(
        geometry,
        spec,
        Qset.barrier,
        c,
        subspace=subspace,
        linear_solver=linear_solver,
        x=x,
        newton_cap=newton_cap,
    )
    try:
        z, SOL_main, log2 = _path_follow(
            ctx2,
            z,
            t,
            t_end,
            kappa,
            maxit,
            theta=0.25,
            final_lam2=tol ** 2 * 100.0,
            verbose=verbose,
            logfile=logfile,
            phase="main",
            # resuming from the f32 leg's centered iterate: the FMG coarse
            # sweep's job (getting ONTO the central path) is already done
            start_fine=SOL_early is not None,
        )
    except AMGBConvergenceFailure:
        if SOL_early is None:
            raise
        # The resumed leg starts at t_switch with no smaller successful t to
        # retreat to; if recentering the f32 handoff fails outright, rerun
        # the whole phase in f64 (the escalation ladder then has full room).
        SOL_early = None
        z, SOL_main, log2 = _path_follow(
            ctx2,
            z_orig,
            t_orig,
            t_end,
            kappa,
            maxit,
            theta=0.25,
            final_lam2=tol ** 2 * 100.0,
            verbose=verbose,
            logfile=logfile,
            phase="main",
        )
    log.extend(log2)
    if SOL_early is not None:
        SOL_main = _merge_phase_logs(SOL_early, SOL_main)

    return AMGBSOL(
        z=z,
        SOL_feasibility=SOL_feasibility,
        SOL_main=SOL_main,
        log=log,
        geometry=geometry,
    )
