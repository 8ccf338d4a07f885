"""Ensemble Hamiltonian Monte Carlo: one fused, jittable kernel.

TPU-native redesign of the reference sampler (reference src/HMC.py:20-183).
The reference's ``getSamples`` is a Python loop over samples around Python
loops over walkers, with one ``jax.grad`` dispatch per walker per integration
step (SURVEY.md §3.1). Here a *single* sampling transition is one pure
function

    step(key, state, step_size) -> (state', info)

containing {thermal momentum refresh -> L leapfrog steps (lax.scan) ->
momentum flip -> per-walker Metropolis accept} entirely inside XLA, batched
over all walkers. ``run_hmc`` then drives warmup (dual-averaging step size +
cross-walker metric estimation) and sampling with ``lax.scan`` over
transitions; the whole chain is a handful of compiled programs regardless of
``num_samples * num_walkers * num_steps``.

Physical-constants semantics: the target at temperature T is
``pi_T(q) ∝ exp(-U(q) / (k_B T))``; momenta are Maxwell-Boltzmann
(std ``sqrt(m k_B T)``, reference ensemble.py:88) and the Metropolis ratio is
``exp(-(H_new - H_old) / (k_B T))``. At ``k_B T = 1`` (the default NATURAL
constants) this is standard HMC and matches the reference's test configs
(reference test_HMC.py uses ``temperature = 1/k_B`` to the same effect).
NOTE: the reference accepts with ``exp(H_old - H_new)`` (HMC.py:115)
regardless of T, which is inconsistent with its thermal momenta for
``k_B T != 1``; the tempered form here is the physically consistent one
(reference references/NotesOnParticleBasedHMC.pdf, eq. 1: weights e^{-beta H})
and reduces to the reference behaviour in every configuration its tests
exercise.

Fixed (not ported) reference bugs — SURVEY.md §7: rejected-walker momenta
restored from *positions* (HMC.py:176); unseeded global RNG (HMC.py:170);
in-place aliasing of ensemble arrays (integrator.py:40-43).
"""

from __future__ import annotations

import dataclasses
import time as _time
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
from flax import struct

from .adaptation import (
    build_warmup_schedule,
    da_init,
    da_update,
    variance_init,
    variance_update,
    regularized_mass,
)
from .constants import Constants, NATURAL
from .ensemble import EnsembleState, kinetic_energy, thermal_momentum_std
from .ops.integrators import get_integrator
from .ops.potentials import batched_value_and_grad

Array = jax.Array


@struct.dataclass
class HMCState:
    """Sampler state: ensemble + cached potential energy and gradient."""

    ensemble: EnsembleState
    potential_energy: Array  # [W]
    grad: Array  # [W, D]


@struct.dataclass
class HMCInfo:
    """Per-transition diagnostics (the reference computes acceptance

    probabilities per walker, HMC.py:168, then discards them — SURVEY.md §5
    'Metrics' gap)."""

    accept_prob: Array  # [W]
    accepted: Array  # [W] bool
    energy_error: Array  # [W] beta * (H_new - H_old)
    divergent: Array  # [W] bool
    potential_energy: Array  # [W]
    step_size: Array  # scalar


@dataclasses.dataclass(frozen=True)
class HMCKernel:
    """A built HMC transition kernel (static config closed over)."""

    init: Callable[..., HMCState]
    step: Callable[[Array, HMCState, Array], tuple[HMCState, HMCInfo]]
    num_steps: int
    grad_evals_per_step: int
    # "xla" | "fused"; fused steps auto-select a pallas variant per call
    # (see ``variant_for``) and accept ``potential_scale=`` for tempering
    kind: str = "xla"
    # (num_walkers, num_dims, mass_ndim) -> "packed-diag" | "packed-generic"
    # | "generic" | "xla": which transition implementation a step with these
    # shapes will execute (introspection for tests/CLI reporting)
    variant_for: Optional[Callable[..., str]] = None


def build_hmc_kernel(
    potential_fn: Callable[[Array], Array],
    *,
    num_steps: int,
    integrator: str = "leapfrog",
    temperature: Union[float, Array] = 1.0,
    constants: Constants = NATURAL,
    divergence_threshold: float = 1000.0,
    use_analytic_grad: bool = True,
) -> HMCKernel:
    """Build the fused ensemble-HMC transition kernel.

    Args:
      potential_fn: per-walker potential ``q:[D] -> scalar`` (negative log
        density). Batched internally; a closed-form ``analytic_grad``
        attribute is used when present.
      num_steps: leapfrog steps per trajectory (static; the scan length).
      integrator: one of ``ops.integrators.INTEGRATORS``.
      temperature: tempering temperature T; target is exp(-U/(k_B T)).
      divergence_threshold: energy error (in units of k_B T) above which a
        trajectory is flagged divergent and rejected.
    """
    integ = get_integrator(integrator)
    vg = batched_value_and_grad(potential_fn, use_analytic=use_analytic_grad)
    beta = constants.beta(temperature)

    def init(q: Array, *, mass: Union[float, Array] = 1.0) -> HMCState:
        q = jnp.asarray(q)
        if q.ndim != 2:
            raise ValueError(
                f"init positions must be [num_walkers, num_dims]; got shape "
                f"{q.shape}. For a single walker pass q[None, :].")
        mass_arr = jnp.asarray(mass, dtype=q.dtype)
        u, g = vg(q)
        ens = EnsembleState(
            q=q,
            p=jnp.zeros_like(q),
            mass=mass_arr,
            log_weight=jnp.zeros(q.shape[:1], dtype=q.dtype),
        )
        return HMCState(ensemble=ens, potential_energy=u, grad=g)

    def step(key: Array, state: HMCState, step_size: Array,
             mass: Optional[Array] = None) -> tuple[HMCState, HMCInfo]:
        ens = state.ensemble
        if mass is None:
            mass = ens.mass
        key_mom, key_acc = jax.random.split(key)

        # Thermal momentum refresh (reference HMC.py:154 -> ensemble.py:78-93)
        p_std = thermal_momentum_std(mass, temperature, constants)
        p0 = p_std * jax.random.normal(key_mom, ens.p.shape, dtype=ens.p.dtype)

        inv_mass = 1.0 / mass
        q1, p1, u1, g1 = integ(
            vg, ens.q, p0, step_size=step_size, num_steps=num_steps,
            inv_mass=inv_mass, grad=state.grad,
            potential_energy=state.potential_energy)
        # Momentum flip for formal reversibility (reference HMC.py:164);
        # statistically a no-op under full refresh but kept so the proposal
        # is exactly its own inverse.
        p1 = -p1

        h0 = kinetic_energy(p0, mass) + state.potential_energy
        h1 = kinetic_energy(p1, mass) + u1
        energy_error = beta * (h1 - h0)
        energy_error = jnp.where(
            jnp.isfinite(energy_error), energy_error, jnp.inf)
        divergent = energy_error > divergence_threshold

        log_u = jnp.log(jax.random.uniform(
            key_acc, energy_error.shape, dtype=ens.q.dtype,
            minval=jnp.finfo(ens.q.dtype).tiny))
        accepted = (log_u < -energy_error) & ~divergent
        accept_prob = jnp.exp(jnp.minimum(0.0, -energy_error))
        accept_prob = jnp.where(divergent, 0.0, accept_prob)

        sel = accepted[:, None]
        new_ens = ens.replace(
            q=jnp.where(sel, q1, ens.q),
            p=jnp.where(sel, p1, p0),  # NOT oldQ — reference HMC.py:176 bug
            mass=mass,
        )
        new_state = HMCState(
            ensemble=new_ens,
            potential_energy=jnp.where(accepted, u1, state.potential_energy),
            grad=jnp.where(sel, g1, state.grad),
        )
        info = HMCInfo(
            accept_prob=accept_prob,
            accepted=accepted,
            energy_error=energy_error,
            divergent=divergent,
            potential_energy=new_state.potential_energy,
            step_size=jnp.asarray(step_size),
        )
        return new_state, info

    return HMCKernel(
        init=init,
        step=step,
        num_steps=num_steps,
        grad_evals_per_step=getattr(integ, "grad_evals_per_step", 1),
    )


@dataclasses.dataclass
class HMCRunResult:
    """Output of :func:`run_hmc`."""

    state: HMCState
    samples: Optional[Array]  # [S, W, D] if collect="samples"
    mean: Optional[Array]  # [D] streaming posterior mean (collect="moments")
    var: Optional[Array]  # [D] streaming posterior variance
    accept_rate: Array  # scalar, post-warmup mean
    divergence_rate: Array  # scalar
    step_size: Array  # adapted step size
    mass: Array  # adapted (diagonal) mass / metric
    num_grad_evals: int  # total potential-gradient evaluations (all walkers)
    kernel_used: str = "xla"  # "fused" | "xla" | "dense" (post-fallback)
    kernel_variant: str = "xla"  # pallas variant the sampling phase executed
    sampling_seconds: float = 0.0  # wall time of the sampling scan (synced)
    metric_cov: Optional[Array] = None  # [D, D] adapted Sigma (metric="dense")


def resolve_kernel_choice(kernel: str, *,
                          integrator: str = "leapfrog") -> str:
    """Resolve a ``kernel="auto"|"fused"|"xla"`` request to what will
    actually run. "auto" picks the fused single-pallas-call transition on
    TPU (the bench-headline path — VERDICT.md round-2 item 1: the product
    surface must reach bench throughput) and the XLA scan elsewhere or for
    non-leapfrog integrators (the fused kernels hard-code kick-drift-kick).
    An explicit "fused" that cannot be honoured degrades to "xla" — with a
    stderr warning — off-TPU (the pallas interpret-mode PRNG has no
    lowering) and for non-leapfrog integrators, matching
    :func:`build_fused_hmc_kernel`'s own fallback.
    """
    if kernel not in ("auto", "fused", "xla"):
        raise ValueError(f"bad kernel={kernel!r} (want auto|fused|xla)")
    if kernel == "xla":
        return "xla"
    fused_ok = (jax.default_backend() == "tpu"
                and integrator in ("leapfrog", "velocity_verlet"))
    if kernel == "fused" and not fused_ok:
        import sys as _sys
        why = ("no TPU backend" if jax.default_backend() != "tpu"
               else f"integrator {integrator!r} has no fused variant")
        print(f"# kernel='fused' unavailable ({why}); running 'xla'",
              file=_sys.stderr)
    return "fused" if fused_ok else "xla"


# Cross-call caches (VERDICT r4: the product surface paid ~4 s of
# per-call fixed overhead — rebuilding the kernel and re-jitting the
# sampling scan on every run_hmc invocation forced a fresh trace +
# compile-cache round trip through the TPU tunnel, burying the ~180M
# transitions/s steady state under bookkeeping for short runs).
# Keyed by object identity of the potential/kernel (strong refs pinned in
# the value so ids stay valid); unhashable configs (array temperature)
# simply skip the cache.
_KERNEL_CACHE: dict = {}
_SCAN_CACHE: dict = {}


def _sample_scan_for(kernel: HMCKernel, collect: str):
    """A jitted sampling scan reusable across run_hmc calls for the same
    built kernel: step_size and the streaming-moment carry ride as
    arguments, so repeated runs (bench double-call, CLI re-invocations
    in-process, chunked drivers) hit jax.jit's cache instead of
    re-tracing."""
    cache_key = (id(kernel), collect)
    hit = _SCAN_CACHE.get(cache_key)
    if hit is not None:
        return hit[0]

    @jax.jit
    def scan_fn(state, keys, step_size, mean0, m2_0, n0):
        dtype = state.ensemble.q.dtype

        def body(carry, key):
            st, mean, m2, n = carry
            new_st, info = kernel.step(key, st, step_size)
            out = {}
            scal = {
                "accept": jnp.mean(info.accept_prob),
                "div": jnp.mean(info.divergent.astype(dtype)),
            }
            if collect == "samples":
                out["q"] = new_st.ensemble.q
            elif collect == "moments":
                q = new_st.ensemble.q
                w = q.shape[0]
                n_new = n + w
                batch_mean = jnp.mean(q, axis=0)
                delta = batch_mean - mean
                mean = mean + delta * (w / n_new)
                batch_m2 = jnp.sum((q - batch_mean) ** 2, axis=0)
                m2 = m2 + batch_m2 + delta**2 * (n * w / n_new)
                n = n_new
            return (new_st, mean, m2, n), (out, scal)

        return jax.lax.scan(body, (state, mean0, m2_0, n0), keys)

    _SCAN_CACHE[cache_key] = (scan_fn, kernel)
    return scan_fn


def run_hmc(
    key: Array,
    potential_fn: Callable[[Array], Array],
    init_q: Array,
    *,
    num_warmup: int,
    num_samples: int,
    num_steps: int,
    init_step_size: float = 0.1,
    target_accept: float = 0.8,
    adapt_step_size: bool = True,
    adapt_mass: bool = True,
    mass: Union[float, Array] = 1.0,
    integrator: str = "leapfrog",
    temperature: Union[float, Array] = 1.0,
    constants: Constants = NATURAL,
    collect: str = "samples",
    thin: int = 1,
    kernel: str = "auto",
    metric: str = "diag",
) -> HMCRunResult:
    """Warmup-adapt and sample with ensemble HMC.

    Warmup uses dual averaging for the step size (Hoffman & Gelman 2014, the
    adaptation scheme specified in the reference's NotesOnParticleBasedHMC.pdf
    and checked-in NUTS paper) with the acceptance statistic averaged over the
    whole ensemble, and — uniquely possible with many walkers — a
    *cross-walker* variance estimate for the diagonal metric (mass = 1/var),
    far lower-variance than single-chain Welford at equal wall-clock.

    ``collect``: "samples" stacks thinned positions ``[S, W, D]``;
    "moments" streams posterior mean/variance (O(D) memory — required at
    10^5 walkers, BASELINE.json config 5); "none" keeps only diagnostics.

    ``kernel``: "auto" (default) runs warmup AND sampling through the
    fully-fused pallas transition on TPU (packed layout when D | 128 —
    the bench-headline engine) and the XLA scan elsewhere; "fused"/"xla"
    force the choice ("fused" still degrades gracefully off-TPU). RNG
    streams differ between the two engines (TPU hardware PRNG vs
    jax.random) but target identical distributions. A prebuilt
    :class:`HMCKernel` instance is also accepted — the multi-chip
    surface (``parallel.sharded.sharded_run_hmc``) passes its
    shard_map-wrapped fused kernel through this driver so warmup,
    adaptation, and collection are one code path for every engine.
    """
    if collect not in ("samples", "moments", "none"):
        raise ValueError(f"bad collect={collect!r}")
    if metric not in ("diag", "dense"):
        raise ValueError(f"bad metric={metric!r} (want diag|dense)")
    if metric == "dense":
        # full mass-matrix path (Stan dense_e analog, MXU-native): its
        # metric rides as traced [D, D] kernel inputs — see
        # build_dense_hmc_kernel. The fused pallas engines are
        # diag-metric by construction, so kernel= does not apply here.
        return _run_hmc_dense(
            key, potential_fn, init_q, num_warmup=num_warmup,
            num_samples=num_samples, num_steps=num_steps,
            init_step_size=init_step_size, target_accept=target_accept,
            adapt_step_size=adapt_step_size, adapt_mass=adapt_mass,
            temperature=temperature, constants=constants,
            collect=collect, thin=thin)
    if isinstance(kernel, HMCKernel):
        pass  # prebuilt (e.g. shard_map-wrapped fused) kernel: use as-is
    else:
        choice = resolve_kernel_choice(kernel, integrator=integrator)
        try:
            ck = (choice, id(potential_fn), num_steps, integrator,
                  float(temperature), id(constants))
        except TypeError:
            ck = None  # array temperature: skip the cross-call cache
        cached = _KERNEL_CACHE.get(ck) if ck is not None else None
        if cached is not None:
            kernel = cached[0]
        else:
            if choice == "fused":
                kernel = build_fused_hmc_kernel(
                    potential_fn, num_steps=num_steps,
                    temperature=temperature, constants=constants)
            else:
                kernel = build_hmc_kernel(
                    potential_fn, num_steps=num_steps, integrator=integrator,
                    temperature=temperature, constants=constants)
            if ck is not None:
                # pin potential_fn/constants so their ids stay valid
                _KERNEL_CACHE[ck] = (kernel, potential_fn, constants)
    state = kernel.init(jnp.asarray(init_q), mass=mass)
    num_dims = state.ensemble.num_dims
    dtype = state.ensemble.q.dtype

    key, warm_key = jax.random.split(key)

    # ---- warmup -----------------------------------------------------------
    step_size = jnp.asarray(init_step_size, dtype=dtype)
    mass_arr = jnp.broadcast_to(
        jnp.asarray(mass, dtype=dtype), (1, num_dims))[0]

    if num_warmup > 0:
        segments = build_warmup_schedule(num_warmup, adapt_mass=adapt_mass)

        warm_key_cache = (id(kernel), "warm", float(target_accept),
                          bool(adapt_step_size))
        hit = _SCAN_CACHE.get(warm_key_cache)
        if hit is not None:
            warm_scan = hit[0]
        else:
            def warm_body(carry, key):
                st, da, varst = carry
                new_st, info = kernel.step(key, st, jnp.exp(da.log_step))
                da = da_update(da, jnp.mean(info.accept_prob),
                               target=target_accept,
                               enabled=adapt_step_size)
                varst = variance_update(varst, new_st.ensemble.q)
                return (new_st, da, varst), None

            warm_scan = jax.jit(lambda carry, keys: jax.lax.scan(
                warm_body, carry, keys))
            _SCAN_CACHE[warm_key_cache] = (warm_scan, kernel)

        for seg in segments:
            da = da_init(step_size)
            varst = variance_init(num_dims, dtype)
            keys = jax.random.split(
                jax.random.fold_in(warm_key, seg.index), seg.length)
            (state, da, varst), _ = warm_scan((state, da, varst), keys)
            step_size = jnp.exp(da.log_avg_step) if adapt_step_size \
                else step_size
            if seg.update_mass and adapt_mass:
                var = regularized_mass(varst)
                mass_arr = 1.0 / var
                state = state.replace(
                    ensemble=state.ensemble.replace(mass=mass_arr))

    # ---- sampling ---------------------------------------------------------
    # streaming Welford over (step, walker) pairs inside a jitted scan
    # memoized per (kernel, collect) across run_hmc calls
    mean0 = jnp.zeros((num_dims,), dtype)
    m2_0 = jnp.zeros((num_dims,), dtype)
    n0 = jnp.zeros((), dtype)
    keys = jax.random.split(key, num_samples)
    sample_scan = _sample_scan_for(kernel, collect)

    t0 = _time.perf_counter()
    (state, mean, m2, n), (outs, scals) = sample_scan(
        state, keys, jnp.asarray(step_size, dtype), mean0, m2_0, n0)
    accept_rate = jnp.mean(scals["accept"])
    float(accept_rate)  # scalar readback = reliable device sync
    sampling_seconds = _time.perf_counter() - t0

    samples = None
    post_mean = post_var = None
    if collect == "samples":
        samples = outs["q"][::thin]
    elif collect == "moments":
        post_mean = mean
        post_var = m2 / jnp.maximum(n - 1.0, 1.0)

    num_walkers = state.ensemble.num_walkers
    total_grads = ((num_warmup + num_samples) * num_walkers
                   * (kernel.num_steps * kernel.grad_evals_per_step + 1))
    variant = "xla"
    if "fused" in kernel.kind and kernel.variant_for is not None:
        variant = kernel.variant_for(num_walkers, num_dims, 1)
    return HMCRunResult(
        state=state,
        samples=samples,
        mean=post_mean,
        var=post_var,
        accept_rate=accept_rate,
        divergence_rate=jnp.mean(scals["div"]),
        step_size=step_size,
        mass=mass_arr,
        num_grad_evals=total_grads,
        kernel_used=kernel.kind,
        kernel_variant=variant,
        sampling_seconds=sampling_seconds,
    )


# (id(potential_fn), num_dims) -> bool; value tuple pins the potential ref
_LOWERING_CACHE: dict = {}


def fused_kernel_lowers(potential_fn, num_dims: int,
                        *, num_steps: int = 2) -> bool:
    """Probe whether the GENERIC fused pallas transition actually lowers
    through Mosaic for this potential (memoized per potential+dims).

    ``kernel="auto"`` must degrade gracefully, but Mosaic lowering
    failures are only discoverable by compiling: e.g. the N-body
    ensemble potential's ``[..., D] -> [..., n_bodies, 3]`` reshape is a
    rank-3 vector shape cast Mosaic cannot lower (found by the r4 config
    suite on hardware — SMC's round-3 ``kernel="auto"`` mutation broke
    this silently). The probe compiles a tiny 8-walker transition once
    and the callers (run_smc, build_fused_hmc_kernel init, ChEES/PT
    builders) fall back to the XLA engine on failure.

    Cost (measured on the v5e tunnel, VERDICT.md r4 weak item 6): the
    cold probe compile is ~5 s for a small analytic potential and ~13 s
    for funnel_32-sized jaxprs, paid ONCE per (potential, dims) at the
    first ``kernel="auto"`` use and memoized after (~2e-5 s). For long
    runs this is noise; a short CLI invocation that wants to skip it
    can pass ``kernel="xla"`` explicitly.
    """
    if jax.default_backend() != "tpu":
        return False
    ck = (id(potential_fn), num_dims)
    hit = _LOWERING_CACHE.get(ck)
    if hit is not None:
        return hit[0]
    from .ops.pallas_kernels import make_fused_hmc_transition
    ok = True
    try:
        vg = batched_value_and_grad(potential_fn)
        qq = jnp.zeros((8, num_dims), jnp.float32)
        uu, gg = vg(qq)
        trans = make_fused_hmc_transition(vg, num_steps=num_steps,
                                          block_walkers=8)
        jax.jit(lambda: trans(
            jnp.int32(0), qq, uu, gg, step_size=jnp.float32(0.01),
            p_std=1.0, inv_mass=1.0, beta=1.0)).lower().compile()
    except Exception as e:
        import sys as _sys
        print(f"# fused kernel unavailable for this potential "
              f"(D={num_dims}): {type(e).__name__}; falling back to the "
              f"XLA engine", file=_sys.stderr)
        ok = False
    _LOWERING_CACHE[ck] = (ok, potential_fn)
    return ok


def build_fused_hmc_kernel(
    potential_fn: Callable[[Array], Array],
    *,
    num_steps: int,
    temperature: Union[float, Array] = 1.0,
    constants: Constants = NATURAL,
    divergence_threshold: float = 1000.0,
    block_walkers: int = 512,
    num_dims: Optional[int] = None,
) -> HMCKernel:
    """Single-kernel HMC: the ENTIRE transition (thermal momentum refresh
    with in-kernel PRNG, trajectory, Metropolis select) as one Pallas call
    per walker block (ops/pallas_kernels.make_fused_hmc_transition) —
    zero intermediate HBM traffic. Same interface and statistics as
    :func:`build_hmc_kernel`; RNG streams come from the TPU hardware
    generator (seeded from the step key) rather than jax.random, so draws
    differ from the unfused kernel but target the same distribution.

    Restrictions: diagonal mass broadcastable to [num_dims] (the warmup's
    per-dim metric qualifies); potential must be jax-traceable (all
    builtins and model potentials are).
    """
    from .ops.packed import PackedUnsupported
    from .ops.pallas_kernels import (
        _use_interpret,
        interpret_fused_enabled,
        make_fused_hmc_diag_quadratic,
        make_fused_hmc_packed,
        make_fused_hmc_transition,
    )

    base = build_hmc_kernel(
        potential_fn, num_steps=num_steps, temperature=temperature,
        constants=constants, divergence_threshold=divergence_threshold)
    if _use_interpret() and not interpret_fused_enabled():
        # off-TPU the composed kernel (same statistics, jax.random
        # streams) stands in; PBBI_FUSED_INTERPRET=1 instead runs the
        # real kernel bodies under pallas interpret mode with the
        # jax.random-backed PRNG shim (CPU-CI coverage of the actual
        # fused code paths — VERDICT.md r4 item 6)
        return base
    vg = batched_value_and_grad(potential_fn)
    beta = constants.beta(temperature)
    diag = getattr(potential_fn, "diag_quadratic", None)
    generic = make_fused_hmc_transition(
        vg, num_steps=num_steps, block_walkers=block_walkers,
        divergence_threshold=divergence_threshold)
    packed = make_fused_hmc_diag_quadratic(
        num_steps=num_steps,
        divergence_threshold=divergence_threshold) if diag is not None         else None

    # generalized packed path: works for any potential whose jaxpr the
    # ops.packed interpreter covers; built once D is known and memoized.
    # The build MUST happen OUTSIDE any trace (the packed interpreter
    # materialises blockdiag/tile constants as numpy — tracers explode),
    # so it runs eagerly here when ``num_dims`` is supplied, or from
    # ``init`` on concrete positions; a step traced before either sees
    # the cache and skips the packed path rather than building mid-trace.
    _packed_generic_cache: dict = {}

    def _packed_generic_for(num_dims: int, build: bool = False):
        if num_dims not in _packed_generic_cache:
            if not build:
                return None
            trans = None
            if 128 % num_dims == 0:
                try:
                    trans = make_fused_hmc_packed(
                        potential_fn, num_dims=num_dims,
                        num_steps=num_steps,
                        divergence_threshold=divergence_threshold)
                except PackedUnsupported:
                    trans = None
            _packed_generic_cache[num_dims] = trans
        return _packed_generic_cache[num_dims]

    # Flipped (eagerly, never inside a trace) when the generic variant
    # would be used but its Mosaic lowering fails for this potential —
    # step then routes to the composed XLA kernel (same statistics).
    _fallback = {"on": False}

    def _check_generic(num_walkers: int, d: int) -> None:
        if _use_interpret():
            return  # interpret mode executes any traceable jaxpr
        if (variant_for(num_walkers, d, 1) == "generic"
                and not fused_kernel_lowers(potential_fn, d)):
            _fallback["on"] = True

    def init(q: Array, *, mass: Union[float, Array] = 1.0) -> HMCState:
        q_arr = jnp.asarray(q)
        if (q_arr.ndim == 2 and diag is None
                and not isinstance(q_arr, jax.core.Tracer)):
            _packed_generic_for(q_arr.shape[-1], build=True)
            _check_generic(q_arr.shape[0], q_arr.shape[-1])
        return base.init(q, mass=mass)

    def variant_for(num_walkers: int, num_dims: int,
                    mass_ndim: int = 1) -> str:
        """Which pallas transition a step with these shapes executes."""
        packable = (128 % num_dims == 0
                    and num_walkers % (128 // num_dims) == 0
                    and mass_ndim <= 1)
        if packable and packed is not None:
            return "packed-diag"
        if packable and _packed_generic_for(num_dims) is not None:
            return "packed-generic"
        return "generic"

    if num_dims is not None and diag is None:
        _packed_generic_for(num_dims, build=True)
        _check_generic(0, num_dims)  # W unknown: 0 forces the generic test

    def step(key: Array, state: HMCState, step_size: Array,
             mass: Optional[Array] = None,
             potential_scale: Optional[Array] = None,
             ) -> tuple[HMCState, HMCInfo]:
        if _fallback["on"]:
            if potential_scale is not None:
                raise ValueError(
                    "this potential's fused kernel does not lower through "
                    "Mosaic and the XLA fallback takes no potential_scale; "
                    "use kernel='xla' (run_smc degrades automatically)")
            return base.step(key, state, step_size, mass=mass)
        ens = state.ensemble
        if mass is None:
            mass = ens.mass
        num_dims = ens.num_dims
        scale = 1.0 if potential_scale is None else potential_scale
        p_std = thermal_momentum_std(mass, temperature, constants)
        seed = jax.random.randint(
            key, (), minval=-(2**31), maxval=2**31 - 1, dtype=jnp.int32)
        mass_arr = jnp.asarray(mass)
        variant = variant_for(ens.num_walkers, num_dims, mass_arr.ndim)
        if variant == "packed-diag":
            k_diag, mean = diag
            q1, g1, u1, accept_prob, accepted, energy_error = packed(
                seed, ens.q, step_size=step_size, p_std=p_std,
                inv_mass=1.0 / mass, beta=beta, k_diag=k_diag, mean=mean,
                scale=scale)
        elif variant == "packed-generic":
            q1, u1, g1, accept_prob, accepted, energy_error = \
                _packed_generic_for(num_dims)(
                    seed, ens.q, state.potential_energy, state.grad,
                    step_size=step_size, p_std=p_std, inv_mass=1.0 / mass,
                    beta=beta, scale=scale)
        else:
            q1, u1, g1, accept_prob, accepted, energy_error = generic(
                seed, ens.q, state.potential_energy, state.grad,
                step_size=step_size, p_std=p_std, inv_mass=1.0 / mass,
                beta=beta, scale=scale)
        new_state = HMCState(
            ensemble=ens.replace(q=q1, mass=mass),
            potential_energy=u1, grad=g1)
        info = HMCInfo(
            accept_prob=accept_prob,
            accepted=accepted,
            energy_error=energy_error,
            divergent=jnp.isinf(energy_error)
            | (energy_error > divergence_threshold),
            potential_energy=u1,
            step_size=jnp.asarray(step_size),
        )
        return new_state, info

    return HMCKernel(
        init=init, step=step, num_steps=num_steps,
        grad_evals_per_step=1, kind="fused", variant_for=variant_for)


def build_dense_hmc_kernel(
    potential_fn: Callable[[Array], Array],
    *,
    num_steps: int,
    temperature: Union[float, Array] = 1.0,
    constants: Constants = NATURAL,
    divergence_threshold: float = 1000.0,
) -> HMCKernel:
    """HMC transition with a DENSE metric (full mass matrix M = Sigma^-1).

    The reference's mass is a per-walker scalar (reference
    ensemble.py:38-43); the diagonal metric of :func:`run_hmc` already
    generalises it. This kernel goes one further — the Stan "dense_e"
    analog — and is the TPU-natural formulation of it: the sampler
    consumes the COVARIANCE Sigma directly (never M), so every
    metric-dependent operation is a [W, D] x [D, D] matmul on the MXU:

      momentum draw   p = sqrt(k_B T) * z @ inv_chol,
                      inv_chol = inv(cholesky(Sigma))  (cov(p) = k_B T M)
      drift           q += dt * p @ Sigma              (M^-1 p = Sigma p)
      kinetic energy  0.5 * sum(p * (p @ Sigma))       (p^T M^-1 p)

    No per-step triangular solves, no explicit inverse of Sigma anywhere
    in the hot loop. ``step(key, state, step_size, cov=Sigma,
    inv_chol=...)`` takes the metric as TRACED arguments, so one compiled
    kernel serves every warmup refinement of Sigma.
    """
    vg = batched_value_and_grad(potential_fn)
    beta = constants.beta(temperature)

    def init(q: Array, *, mass: Union[float, Array] = 1.0) -> HMCState:
        q = jnp.asarray(q)
        if q.ndim != 2:
            raise ValueError(
                f"init positions must be [num_walkers, num_dims]; got "
                f"shape {q.shape}")
        u, g = vg(q)
        ens = EnsembleState(
            q=q, p=jnp.zeros_like(q),
            mass=jnp.asarray(mass, q.dtype),
            log_weight=jnp.zeros(q.shape[:1], dtype=q.dtype))
        return HMCState(ensemble=ens, potential_energy=u, grad=g)

    kBT = 1.0 / beta

    def step(key: Array, state: HMCState, step_size: Array,
             cov: Array, inv_chol: Array) -> tuple[HMCState, HMCInfo]:
        ens = state.ensemble
        key_mom, key_acc = jax.random.split(key)
        z = jax.random.normal(key_mom, ens.q.shape, dtype=ens.q.dtype)
        p0 = jnp.sqrt(kBT).astype(ens.q.dtype) * (z @ inv_chol)

        def ke(p):
            return 0.5 * jnp.sum(p * (p @ cov), axis=-1)

        dt = step_size

        def body(carry, _):
            q, p, u, g = carry
            p = p - (0.5 * dt) * g
            q = q + dt * (p @ cov)
            u, g = vg(q)
            p = p - (0.5 * dt) * g
            return (q, p, u, g), None

        (q1, p1, u1, g1), _ = jax.lax.scan(
            body, (ens.q, p0, state.potential_energy, state.grad),
            None, length=num_steps)
        p1 = -p1

        h0 = ke(p0) + state.potential_energy
        h1 = ke(p1) + u1
        energy_error = beta * (h1 - h0)
        energy_error = jnp.where(
            jnp.isfinite(energy_error), energy_error, jnp.inf)
        divergent = energy_error > divergence_threshold
        log_u = jnp.log(jax.random.uniform(
            key_acc, energy_error.shape, dtype=ens.q.dtype,
            minval=jnp.finfo(ens.q.dtype).tiny))
        accepted = (log_u < -energy_error) & ~divergent
        accept_prob = jnp.where(
            divergent, 0.0, jnp.exp(jnp.minimum(0.0, -energy_error)))
        sel = accepted[:, None]
        new_state = HMCState(
            ensemble=ens.replace(
                q=jnp.where(sel, q1, ens.q),
                p=jnp.where(sel, p1, p0)),
            potential_energy=jnp.where(accepted, u1,
                                       state.potential_energy),
            grad=jnp.where(sel, g1, state.grad))
        info = HMCInfo(
            accept_prob=accept_prob, accepted=accepted,
            energy_error=energy_error, divergent=divergent,
            potential_energy=new_state.potential_energy,
            step_size=jnp.asarray(step_size))
        return new_state, info

    return HMCKernel(init=init, step=step, num_steps=num_steps,
                     grad_evals_per_step=1, kind="dense")


def _run_hmc_dense(
    key, potential_fn, init_q, *, num_warmup, num_samples, num_steps,
    init_step_size, target_accept, adapt_step_size, adapt_mass,
    temperature, constants, collect, thin,
) -> HMCRunResult:
    """Dense-metric driver behind ``run_hmc(metric="dense")``: warmup
    jointly dual-averages the step size and streams the cross-walker
    covariance (adaptation.CovarianceState — one MXU matmul per
    transition); between segments the regularised Sigma and
    inv(chol(Sigma)) refresh as TRACED kernel inputs (no recompiles)."""
    from .adaptation import (covariance_init, covariance_update,
                             regularized_covariance)

    kernel = build_dense_hmc_kernel(
        potential_fn, num_steps=num_steps, temperature=temperature,
        constants=constants)
    state = kernel.init(jnp.asarray(init_q))
    num_dims = state.ensemble.num_dims
    dtype = state.ensemble.q.dtype
    key, warm_key = jax.random.split(key)

    step_size = jnp.asarray(init_step_size, dtype)
    cov = jnp.eye(num_dims, dtype=dtype)
    inv_chol = jnp.eye(num_dims, dtype=dtype)

    if num_warmup > 0:
        segments = build_warmup_schedule(num_warmup, adapt_mass=adapt_mass)

        @jax.jit
        def warm_scan(carry, keys, cov, inv_chol):
            def body(carry, k):
                st, da, cst = carry
                new_st, info = kernel.step(
                    k, st, jnp.exp(da.log_step), cov, inv_chol)
                da = da_update(da, jnp.mean(info.accept_prob),
                               target=target_accept,
                               enabled=adapt_step_size)
                cst = covariance_update(cst, new_st.ensemble.q)
                return (new_st, da, cst), None
            return jax.lax.scan(body, carry, keys)

        for seg in segments:
            da = da_init(step_size)
            cst = covariance_init(num_dims, dtype)
            keys = jax.random.split(
                jax.random.fold_in(warm_key, seg.index), seg.length)
            (state, da, cst), _ = warm_scan(
                (state, da, cst), keys, cov, inv_chol)
            if adapt_step_size:
                step_size = jnp.exp(da.log_avg_step)
            if seg.update_mass and adapt_mass:
                cov = regularized_covariance(cst)
                chol = jnp.linalg.cholesky(cov)
                inv_chol = jax.scipy.linalg.solve_triangular(
                    chol, jnp.eye(num_dims, dtype=dtype), lower=True)

    # ---- sampling -------------------------------------------------------
    mean0 = jnp.zeros((num_dims,), dtype)
    m2_0 = jnp.zeros((num_dims,), dtype)
    n0 = jnp.zeros((), dtype)

    @jax.jit
    def sample_scan(state, keys, step_size, cov, inv_chol, mean0, m2_0, n0):
        def body(carry, k):
            st, mean, m2, n = carry
            new_st, info = kernel.step(k, st, step_size, cov, inv_chol)
            out = {}
            scal = {"accept": jnp.mean(info.accept_prob),
                    "div": jnp.mean(info.divergent.astype(dtype))}
            if collect == "samples":
                out["q"] = new_st.ensemble.q
            elif collect == "moments":
                q = new_st.ensemble.q
                w = q.shape[0]
                n_new = n + w
                bm = jnp.mean(q, axis=0)
                delta = bm - mean
                mean = mean + delta * (w / n_new)
                m2 = m2 + jnp.sum((q - bm) ** 2, axis=0) \
                    + delta**2 * (n * w / n_new)
                n = n_new
            return (new_st, mean, m2, n), (out, scal)
        return jax.lax.scan(body, (state, mean0, m2_0, n0), keys)

    keys = jax.random.split(key, num_samples)
    t0 = _time.perf_counter()
    (state, mean, m2, n), (outs, scals) = sample_scan(
        state, keys, step_size, cov, inv_chol, mean0, m2_0, n0)
    accept_rate = jnp.mean(scals["accept"])
    float(accept_rate)
    sampling_seconds = _time.perf_counter() - t0

    samples = None
    post_mean = post_var = None
    if collect == "samples":
        samples = outs["q"][::thin]
    elif collect == "moments":
        post_mean = mean
        post_var = m2 / jnp.maximum(n - 1.0, 1.0)

    num_walkers = state.ensemble.num_walkers
    total_grads = ((num_warmup + num_samples) * num_walkers
                   * (num_steps + 1))
    return HMCRunResult(
        state=state, samples=samples, mean=post_mean, var=post_var,
        accept_rate=accept_rate,
        divergence_rate=jnp.mean(scals["div"]),
        step_size=step_size,
        mass=1.0 / jnp.diagonal(cov),
        num_grad_evals=total_grads,
        kernel_used="dense", kernel_variant="dense-xla",
        sampling_seconds=sampling_seconds,
        metric_cov=cov,
    )
