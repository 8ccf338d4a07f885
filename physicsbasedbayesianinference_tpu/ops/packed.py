"""Walker-packed layout transform: evaluate ANY potential at full VPU lane
utilisation.

The TPU VPU operates on (8, 128) float32 tiles. A [W, D] ensemble with
D < 128 wastes (128 - D)/128 of every lane row; the BASELINE.md kernel
ladder measured 4x throughput from packing P = 128/D walkers into each
row for the diagonal-quadratic special case. This module generalises the
trick to *arbitrary jax-traceable potentials* (VERDICT.md round-1 item 1):

    packed_vg = packed_value_and_grad(potential_fn, num_dims)
    u, g = packed_vg(qp)     # qp: [rows, P*D]  ->  u: [rows, P], g like qp

The per-walker ``value_and_grad`` jaxpr is re-interpreted in the packed
layout by two rules:

* **elementwise** primitives (add/mul/exp/select_n/...) act identically in
  any layout — they are re-bound on the packed arrays unchanged; constants
  are tiled once per walker segment.
* **affine** primitives (slice, pad, broadcast_in_dim, reduce_sum,
  dot_general against constants, gather, scatter-add, concatenate,
  transpose, ...) are *linear maps* on the per-walker tail. Each is
  materialised once, at transform time, into its matrix ``M[k_in, k_out]``
  by evaluating the primitive on basis vectors; the packed op is then one
  ``(rows, P*k_in) @ blockdiag_P(M)`` matmul — which runs on the MXU,
  turning layout bookkeeping into systolic-array work.

  **Affine chains FUSE** (VERDICT.md round-4 item 2): consecutive affine
  primitives — and linear elementwise ops (add/sub, mul/div by
  constants, neg) between them — compose symbolically at build time into
  one matrix per *distinct nonlinear source*, so e.g. a logistic
  regression's whole forward chain ``slice(w) -> X @ w -> + broadcast(b)``
  is ONE ``[P*D, P*N]`` matmul and the autodiff's backward chain
  ``X^T s -> pad -> concat -> + prior grad`` is one matmul per source
  (``s`` and ``q``) instead of one per primitive. This both removes the
  redundant MXU passes that made data-heavy potentials 4-8x slower than
  the floor and shrinks the kernel's live VMEM set (fewer
  intermediates), which lifts the usable block size.
* **segment reductions** that are not linear (reduce_max/reduce_min, the
  core of logsumexp in mixture targets) use a masked lane-shift fold:
  ceil(log2(k)) shifted elementwise max/min passes, then a 0/1 extraction
  matmul.

Because the transform is jax->jax, the packed function traces into the
fused Pallas HMC kernel exactly like any other potential (the blockdiag
matrices ride the existing const-hoisting path) AND is unit-testable on
CPU against the unpacked oracle with no TPU in the loop.

Reference parity anchor: this serves the models the reference actually
fits (samples/NumpyroExamples/eight_schools.py:5-10, CoinToss.py:5-22) at
the throughput previously reserved for the synthetic Gaussian benchmark.

Dimensions that do not divide 128 are handled by :func:`pad_potential`:
the state is embedded in R^{D'} (next divisor of 128) with independent
standard-normal auxiliary coordinates — a product target whose first-D
marginals are exactly the original posterior.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.extend import core as jcore

Array = jax.Array


class PackedUnsupported(Exception):
    """Raised when a potential's jaxpr uses a primitive (or primitive mode)
    the packed interpreter does not cover; callers fall back to the natural
    [W, D] layout (hmc.build_fused_hmc_kernel does this automatically)."""


# Elementwise primitives: same op in any layout. Names are
# ``jax.extend.core.Primitive.name`` strings.
_ELEMENTWISE = frozenset({
    "add", "add_any", "sub", "mul", "div", "rem", "neg", "sign", "abs",
    "exp", "exp2", "expm1", "log", "log1p", "sqrt", "rsqrt", "cbrt",
    "integer_pow", "pow", "square",
    "sin", "cos", "tan", "asin", "acos", "atan", "atan2",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh",
    "erf", "erfc", "erf_inv", "lgamma", "digamma", "logistic",
    "floor", "ceil", "round", "clamp", "nextafter",
    "max", "min", "eq", "ne", "ge", "gt", "le", "lt",
    "and", "or", "xor", "not", "is_finite", "select_n",
    "stop_gradient", "copy", "convert_element_type",
})

# Affine (jointly linear + constant offset) in their array operands when
# all shape/index parameters are static — representable as one matrix per
# walker-dependent operand.
_AFFINE = frozenset({
    "broadcast_in_dim", "pad", "slice", "squeeze", "reshape", "expand_dims",
    "reduce_sum", "dot_general", "gather", "scatter-add", "scatter_add",
    "concatenate", "transpose", "rev", "real", "imag", "cumsum",
    "dynamic_slice",
})

# Call-like primitives to recurse through.
_CALLS = frozenset({
    "pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call",
    "custom_jvp_call_jaxpr", "custom_vjp_call_jaxpr", "remat", "checkpoint",
    "remat2", "custom_vjp_call_custom_transpose",
})

_SEG_REDUCE = frozenset({"reduce_max", "reduce_min"})


class _Packed:
    """A walker-dependent value: ``arr`` is ``(rows, P * k)`` (or a
    row-broadcastable ``(1, P * k)``); ``tail`` is the logical per-walker
    shape, ``k = prod(tail)``."""

    __slots__ = ("arr", "tail")

    def __init__(self, arr, tail):
        self.arr = arr
        self.tail = tuple(tail)

    @property
    def k(self) -> int:
        return int(np.prod(self.tail, dtype=np.int64)) if self.tail else 1


class _Const:
    """A walker-independent value kept in its logical shape; primitives
    among constants evaluate eagerly (constant folding)."""

    __slots__ = ("val",)

    def __init__(self, val):
        self.val = val


class _Affine:
    """A LAZY affine function of materialised packed values:

        value = sum_i  src_i @ M_i  (+ offset)

    with ``src_i`` a :class:`_Packed` (a nonlinear "source": kernel input
    or elementwise-op output), ``M_i`` a build-time numpy matrix
    ``[k_src_i, k_out]`` (``None`` = identity), and ``offset`` a flat
    numpy ``[k_out]`` (or None). Consecutive affine primitives compose
    into these matrices symbolically; add/sub merge term lists (terms
    with the SAME source merge by matrix addition — the mechanism that
    collapses e.g. a whole GLM forward chain into one matmul);
    materialisation (at the first nonlinear consumer) emits exactly one
    block-diagonal matmul per distinct source.
    """

    __slots__ = ("terms", "off", "tail", "dtype", "_mat")

    def __init__(self, terms, off, tail, dtype):
        self.terms = terms          # list[(_Packed, Optional[np.ndarray])]
        self.off = off              # Optional[np.ndarray] flat [k_out]
        self.tail = tuple(tail)
        self.dtype = dtype
        self._mat = None            # materialisation cache (per pass)

    @property
    def k(self) -> int:
        return int(np.prod(self.tail, dtype=np.int64)) if self.tail else 1


def _merge_terms(terms):
    """Sum matrices of terms sharing a source (id identity): the fusion
    step that turns parallel affine paths from one source into a single
    matmul. Identity (None) promotes to an explicit eye first."""
    merged: dict = {}
    for src, m in terms:
        sid = id(src)
        if sid in merged:
            prev_src, prev_m = merged[sid]
            if prev_m is None:
                prev_m = np.eye(src.k, dtype=np.float32)
            if m is None:
                m = np.eye(src.k, dtype=np.float32)
            merged[sid] = (prev_src, prev_m + m)
        else:
            merged[sid] = (src, m)
    return list(merged.values())


def _aff_of(v, tail, dtype):
    """Wrap a _Packed as an identity _Affine (for term-list algebra)."""
    return _Affine([(v, None)], None, tail, dtype)


def _aff_compose(v, m_next, off_next, out_tail, dtype):
    """(affine or packed) followed by the linear map m_next (+ off_next):
    pure numpy composition, no staged ops."""
    if isinstance(v, _Packed):
        return _Affine([(v, m_next)], off_next, out_tail, dtype)
    terms = []
    for src, m in v.terms:
        terms.append((src, m_next if m is None else m @ m_next))
    off = off_next
    if v.off is not None:
        extra = v.off @ m_next
        off = extra if off is None else off + extra
    return _Affine(terms, off, out_tail, dtype)


def _aff_broadcast_lazy(v: "_Affine", out_tail):
    """Broadcast an affine value's tail (free: right-multiply by the 0/1
    broadcast matrix)."""
    if v.tail == tuple(out_tail):
        return v
    b = _bcast_matrix_np(v.tail, out_tail, np.float32)
    return _aff_compose(v, b, None, out_tail, v.dtype)


def _aff_scale(v: "_Affine", c, out_tail):
    """Elementwise multiply by a constant (right-multiply by diag(c));
    ``c`` broadcastable to out_tail."""
    v = _aff_broadcast_lazy(v, out_tail)
    c_flat = np.broadcast_to(_np(c), out_tail).reshape(-1).astype(np.float32)
    terms = []
    k = v.k
    for src, m in v.terms:
        if m is None:
            m = np.eye(k, dtype=np.float32)
        terms.append((src, m * c_flat[None, :]))
    off = None if v.off is None else v.off * c_flat
    return _Affine(terms, off, out_tail, v.dtype)


def _aff_add_offset(v: "_Affine", c, out_tail):
    v = _aff_broadcast_lazy(v, out_tail)
    c_flat = np.broadcast_to(_np(c), out_tail).reshape(-1).astype(np.float32)
    off = c_flat if v.off is None else v.off + c_flat
    return _Affine(v.terms, off, out_tail, v.dtype)


def _aff_add(a: "_Affine", b: "_Affine", out_tail):
    a = _aff_broadcast_lazy(a, out_tail)
    b = _aff_broadcast_lazy(b, out_tail)
    off = a.off
    if b.off is not None:
        off = b.off if off is None else off + b.off
    return _Affine(a.terms + b.terms, off, out_tail, a.dtype)


def _affine_content_key(terms, off):
    """Content identity of a merged affine value (source object ids +
    matrix/offset bytes): distinct _Affine objects that compute the SAME
    function of the same sources (common in autodiff jaxprs — e.g. a
    NaN-guard select re-derives the logits three ways) materialise once."""
    parts = []
    for src, m in terms:
        # m + 0.0 canonicalises -0.0 so byte-equality matches value-equality
        parts.append((id(src), None if m is None else (m + 0.0).tobytes()))
    off_part = None
    if off is not None and np.any(off):
        off_part = (off + 0.0).tobytes()
    return (tuple(parts), off_part)


def _materialize(v, pack: int, store, key, reg=None):
    """_Affine -> _Packed: one blockdiag matmul per distinct source, plus
    the offset tile. _Packed passes through. Cached on the object so a
    value with several nonlinear consumers materialises once (build and
    trace passes visit consumers in the same order, so the memo keys —
    taken from the FIRST consumer — agree across passes); additionally
    deduplicated per evaluation pass by CONTENT via ``reg`` (same
    sources, same matrices -> same packed array)."""
    if isinstance(v, _Packed):
        return v
    if v._mat is not None:
        return v._mat
    terms = _merge_terms(v.terms)
    ckey = None
    if reg is not None:
        ckey = (_affine_content_key(terms, v.off), v.tail)
        hit = reg.get(ckey)
        if hit is not None:
            v._mat = hit
            return hit
    acc = None
    for i, (src, m) in enumerate(terms):
        if m is None:
            term = src.arr
        elif (m.shape[0] == m.shape[1]
              and np.count_nonzero(m - np.diag(np.diag(m))) == 0):
            # diagonal map (scaled identity / per-element scale): an
            # elementwise multiply by the tiled diagonal, not a matmul
            dg = _memo(store, (key, "affdiag", i),
                       lambda m=m: _tile_const_np(
                           np.diag(m), pack).astype(np.float32))
            term = src.arr * dg
        else:
            bd = _memo(store, (key, "affmat", i),
                       lambda m=m: _blockdiag_np(
                           m.astype(np.float32), pack))
            term = jnp.dot(src.arr, bd,
                           preferred_element_type=src.arr.dtype)
        acc = term if acc is None else acc + term
    if v.off is not None and np.any(v.off):
        off_t = _memo(store, (key, "affoff"),
                      lambda: _tile_const_np(
                          v.off.reshape(v.tail) if v.tail else v.off[0],
                          pack).astype(np.float32))
        acc = acc if acc is not None else 0.0
        acc = acc + off_t
    if acc is None or not hasattr(acc, "shape"):
        base = acc if acc is not None else 0.0
        acc = jnp.full((1, pack * v.k), base, v.dtype)
    out = _Packed(acc, v.tail)
    v._mat = out
    if reg is not None and ckey is not None:
        reg[ckey] = out
    return out


def _is_walker(v) -> bool:
    return isinstance(v, (_Packed, _Affine))


def _val_dtype(v):
    if isinstance(v, _Packed):
        return v.arr.dtype
    if isinstance(v, _Affine):
        return v.dtype
    return jnp.asarray(v.val).dtype


def _fusable(v) -> bool:
    """Affine algebra is carried in float32 numpy; only fuse float32
    walker values (the framework's working dtype) — everything else takes
    the materialise-first path."""
    return _val_dtype(v) == jnp.float32


def _try_linear_elementwise(name, eqn, invals, out_tail, store, ek):
    """Fuse LINEAR elementwise ops (add/sub/add_any, mul/div by
    constants, neg) into the affine representation instead of
    materialising their operands. Returns an _Affine, or None when the
    op/operand mix is not linear (caller falls back to the generic
    elementwise path)."""
    if not all(isinstance(v, (_Packed, _Affine, _Const)) for v in invals):
        return None
    walkers = [v for v in invals if _is_walker(v)]
    if not any(isinstance(v, _Affine) for v in walkers):
        return None  # no fusion opportunity: plain elementwise is fine
    if not all(_fusable(v) for v in walkers):
        return None
    dtype = _val_dtype(walkers[0])

    def as_aff(v):
        if isinstance(v, _Affine):
            return _aff_broadcast_lazy(v, out_tail)
        return _aff_broadcast_lazy(_aff_of(v, v.tail, dtype), out_tail)

    if name in ("add", "add_any", "sub") and len(invals) == 2:
        a, b = invals
        sign = -1.0 if name == "sub" else 1.0
        if _is_walker(a) and _is_walker(b):
            bb = as_aff(b)
            if sign < 0:
                bb = _aff_scale(bb, -1.0, out_tail)
            return _aff_add(as_aff(a), bb, out_tail)
        if _is_walker(a) and isinstance(b, _Const):
            c = np.asarray(_np(b.val), np.float32) * sign
            return _aff_add_offset(as_aff(a), c, out_tail)
        if isinstance(a, _Const) and _is_walker(b):
            bb = as_aff(b)
            if sign < 0:
                bb = _aff_scale(bb, -1.0, out_tail)
            return _aff_add_offset(bb, _np(a.val), out_tail)
    if name == "mul" and len(invals) == 2:
        a, b = invals
        if _is_walker(a) and isinstance(b, _Const):
            return _aff_scale(as_aff(a), b.val, out_tail)
        if isinstance(a, _Const) and _is_walker(b):
            return _aff_scale(as_aff(b), a.val, out_tail)
    if name == "div" and len(invals) == 2:
        a, b = invals
        if _is_walker(a) and isinstance(b, _Const):
            return _aff_scale(as_aff(a), 1.0 / _np(b.val), out_tail)
    if name == "neg" and len(invals) == 1:
        return _aff_scale(as_aff(invals[0]), -1.0, out_tail)
    return None


def _memo(store, key, thunk):
    """Build-time memoisation of constant artifacts.

    The interpreter runs twice: once at build time on a concrete probe
    (outside any trace — every constant matrix/tile is computed eagerly and
    cached as numpy), then under tracing at each use, where these cached
    numpy constants enter the graph as jaxpr *constants* rather than as
    staged constant-constructing ops. This matters inside Pallas kernels:
    constant-construction primitives (iota/eq/kron reshapes) would otherwise
    land in the kernel body, where Mosaic cannot lower them.
    """
    if key not in store:
        store[key] = thunk()
    return store[key]


def _np(x):
    return np.asarray(jax.device_get(x))


def _tile_const_np(val, pack: int):
    """Logical const (shape == tail) -> packed numpy row ``(1, P * k)``."""
    flat = _np(val).reshape(-1)
    return np.tile(flat, (pack,))[None, :]


def _blockdiag_np(m, pack: int):
    """``M[k1, k2] -> blockdiag_P(M)[P*k1, P*k2]`` (numpy)."""
    m = _np(m)
    return np.kron(np.eye(pack, dtype=m.dtype), m)


def _bcast_matrix_np(tail_in: tuple, out_tail: tuple, dtype) -> np.ndarray:
    """0/1 matrix M[k_in, k_out] with broadcast(x) == x @ M (numpy
    size-1-broadcasting semantics from tail_in to out_tail)."""
    k_in = int(np.prod(tail_in, dtype=np.int64)) if tail_in else 1
    k_out = int(np.prod(out_tail, dtype=np.int64)) if out_tail else 1
    basis = np.eye(k_in, dtype=np.float32).reshape((k_in,) + tuple(tail_in))
    cols = np.stack([np.broadcast_to(b, out_tail) for b in basis])
    return cols.reshape(k_in, k_out).astype(dtype)


def _broadcast_packed(v: _Packed, out_tail: tuple, pack: int, store,
                      key) -> Array:
    """Broadcast a packed value's tail to ``out_tail`` inside the packed
    layout: identity when tails match, else one block-diagonal 0/1 matmul."""
    if v.tail == tuple(out_tail):
        return v.arr
    k_out = int(np.prod(out_tail, dtype=np.int64)) if out_tail else 1
    if v.k == 1 and k_out == 1:
        return v.arr
    dt = v.arr.dtype
    if dt == jnp.bool_:
        # 0/1 blockdiag matmuls are exact on {0,1} floats
        f = _broadcast_packed(
            _Packed(v.arr.astype(jnp.float32), v.tail), out_tail, pack,
            store, key)
        return f > 0.5
    if not jnp.issubdtype(dt, jnp.floating):
        raise PackedUnsupported(
            f"broadcast of non-float walker value {dt} in packed layout")
    b = _memo(store, key, lambda: _blockdiag_np(
        _bcast_matrix_np(v.tail, out_tail, np.dtype(dt)), pack))
    return jnp.dot(v.arr, b, preferred_element_type=dt)


def _subjaxpr(eqn):
    params = eqn.params
    for key in ("jaxpr", "call_jaxpr"):
        if key in params:
            j = params[key]
            if hasattr(j, "jaxpr"):  # ClosedJaxpr
                return j.jaxpr, j.consts
            return j, []
    raise PackedUnsupported(f"call primitive without jaxpr: {eqn.primitive}")


def _segment_fold(arr: Array, k: int, pack: int, prim_name: str) -> Array:
    """Non-linear segment reduction (max/min) over contiguous k-segments of
    a packed ``(rows, P*k)`` row -> ``(rows, P)`` via masked lane-shift
    folding: log2(k) shifted elementwise passes + one extraction matmul.
    All masks/matrices are numpy constants (nothing staged)."""
    if prim_name == "reduce_max":
        ident, op = -np.inf, jnp.maximum
    else:
        ident, op = np.inf, jnp.minimum
    width = pack * k
    cols = np.arange(width)
    s = 1
    while s < k:
        # shift left by s lanes; positions whose segment has >= s more
        # entries fold the shifted value in, the rest keep identity.
        # The mask is a 2D float constant (all kernel-visible constants
        # stay 2D so they ride VMEM blocks without Mosaic reshapes).
        shifted = jnp.concatenate(
            [arr[:, s:], jnp.full((arr.shape[0], s), ident, arr.dtype)],
            axis=1)
        valid = (((cols % k) + s < k)
                 .astype(np.dtype(arr.dtype)).reshape(1, width))
        arr = op(arr, jnp.where(valid > 0.5, shifted, ident))
        s *= 2
    extract = np.zeros((width, pack), np.dtype(arr.dtype))
    extract[np.arange(pack) * k, np.arange(pack)] = 1.0
    return jnp.dot(arr, extract, preferred_element_type=arr.dtype)


def _eval_packed(jaxpr, consts, args, pack: int, store, path=(), reg=None):
    """Interpret ``jaxpr`` with walker-dependent inputs in packed layout.

    ``store`` memoises every constant artifact across calls (see _memo);
    ``path`` disambiguates eqns inside nested call jaxprs; ``reg`` is the
    per-pass affine-materialisation dedup registry (created at the top
    level, shared down the call tree).
    """
    if reg is None:
        reg = {}
    env = {}

    def read(v):
        if isinstance(v, jcore.Literal) or type(v).__name__ == "Literal":
            return _Const(v.val)
        return env[v]

    def write(v, val):
        env[v] = val

    for var, const in zip(jaxpr.constvars, consts):
        write(var, _Const(const))
    for var, arg in zip(jaxpr.invars, args):
        write(var, arg)

    for idx, eqn in enumerate(jaxpr.eqns):
        invals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        ek = path + (idx,)

        if all(isinstance(v, _Const) for v in invals):
            # walker-independent subcomputation: evaluate once at build
            # time in logical shape; cached as numpy constants
            def _fold(eqn=eqn, invals=invals):
                outs = eqn.primitive.bind(
                    *[v.val for v in invals], **eqn.params)
                if not eqn.primitive.multiple_results:
                    outs = [outs]
                return [_np(o) for o in outs]
            outs = _memo(store, (ek, "const"), _fold)
            for ovar, o in zip(eqn.outvars, outs):
                write(ovar, _Const(o))
            continue

        if name in _CALLS:
            sub, sub_consts = _subjaxpr(eqn)
            outs = _eval_packed(sub, sub_consts, invals[:len(sub.invars)],
                                pack, store, ek, reg)
            for ovar, o in zip(eqn.outvars, outs):
                write(ovar, o)
            continue

        if name in _ELEMENTWISE:
            # lax elementwise ops broadcast size-1 dims; align every
            # operand to the output tail in packed space first
            out_tail = tuple(eqn.outvars[0].aval.shape)
            fused = _try_linear_elementwise(
                name, eqn, invals, out_tail, store, ek)
            if fused is not None:
                write(eqn.outvars[0], fused)
                continue
            ops = []
            for i, v in enumerate(invals):
                if _is_walker(v):
                    v = _materialize(v, pack, store, (ek, "mat", i), reg)
                    ops.append(_broadcast_packed(v, out_tail, pack, store,
                                                 (ek, "bc", i)))
                else:
                    ops.append(_memo(
                        store, (ek, "tile", i),
                        lambda v=v: _tile_const_np(
                            np.broadcast_to(_np(v.val), out_tail), pack)))
            # lax primitives require exactly equal shapes under tracing;
            # XLA/Mosaic fold the row broadcasts into the consuming op
            rows = max(op.shape[0] for op in ops)
            ops = [jnp.broadcast_to(op, (rows,) + op.shape[1:])
                   for op in ops]
            out = eqn.primitive.bind(*ops, **eqn.params)
            write(eqn.outvars[0], _Packed(out, out_tail))
            continue

        if name in _SEG_REDUCE:
            (v,) = [x for x in invals if _is_walker(x)]
            v = _materialize(v, pack, store, (ek, "mat"), reg)
            axes = eqn.params.get("axes", ())
            if tuple(axes) != tuple(range(len(v.tail))):
                raise PackedUnsupported(
                    f"{name} over partial axes {axes} of tail {v.tail}")
            out = _segment_fold(v.arr, v.k, pack, name)
            write(eqn.outvars[0], _Packed(out, ()))
            continue

        if name in _AFFINE:
            out = _affine_rule(eqn, invals, pack, store, ek, reg)
            write(eqn.outvars[0], out)
            continue

        raise PackedUnsupported(f"primitive not supported packed: {name}")

    outs = []
    for i, v in enumerate(jaxpr.outvars):
        val = read(v)
        if isinstance(val, _Affine) and path == ():
            # top-level outputs materialise; nested-call outputs stay
            # lazy so affine chains fuse across pjit/custom_jvp frames
            val = _materialize(val, pack, store, (path, "out", i), reg)
        outs.append(val)
    return outs


def _affine_rule(eqn, invals, pack: int, store, ek, reg=None):
    """Generic affine primitive: materialise the per-operand linear map by
    basis evaluation (once, at build time, on concrete constants) and
    COMPOSE it lazily into the operands' affine representations (see
    :class:`_Affine`) — the blockdiag matmuls are only emitted at the
    first nonlinear consumer, one per distinct source."""
    out_aval = eqn.outvars[0].aval
    out_tail = tuple(out_aval.shape)
    k_out = int(np.prod(out_tail, dtype=np.int64)) if out_tail else 1
    name = eqn.primitive.name

    walker_pos = [i for i, v in enumerate(invals) if _is_walker(v)]

    # dot_general between two walker-dependent operands: only the full
    # inner product (elementwise mul + segment sum) is supported.
    if name == "dot_general" and len(walker_pos) == 2:
        dn = eqn.params["dimension_numbers"]
        (lc, rc), (lb, rb) = dn
        a = _materialize(invals[0], pack, store, (ek, "mat", 0), reg)
        b = _materialize(invals[1], pack, store, (ek, "mat", 1), reg)
        if (a.tail == b.tail and tuple(lc) == tuple(range(len(a.tail)))
                and tuple(rc) == tuple(lc) and not lb and not rb):
            prod = a.arr * b.arr
            ones = _memo(store, (ek, "ones"), lambda: _blockdiag_np(
                np.ones((a.k, 1), np.dtype(prod.dtype)), pack))
            out = jnp.dot(prod, ones, preferred_element_type=prod.dtype)
            return _Packed(out, ())
        raise PackedUnsupported(
            "dot_general between two walker-dependent operands with "
            f"dimension_numbers={dn}")

    for i in walker_pos:
        dt = _val_dtype(invals[i])
        if not jnp.issubdtype(dt, jnp.floating):
            raise PackedUnsupported(
                f"affine primitive {name} on non-float walker value {dt}")

    # fast path: pure layout changes with k preserved (row-major reshape
    # within a walker segment is the identity on the packed row)
    if name in ("reshape", "squeeze", "expand_dims") and len(walker_pos) == 1:
        v = invals[walker_pos[0]]
        if v.k == k_out and (name != "reshape"
                             or eqn.params.get("dimensions") is None):
            if isinstance(v, _Affine):
                return _Affine(v.terms, v.off, out_tail, v.dtype)
            return _Packed(v.arr, out_tail)

    fusable = all(_fusable(invals[i]) for i in walker_pos)

    def _materialise():
        zeros = {
            i: jnp.zeros(invals[i].tail, dtype=_val_dtype(invals[i]))
            for i in walker_pos
        }

        def h(subs):
            ops = []
            for i, v in enumerate(invals):
                if _is_walker(v):
                    ops.append(subs.get(i, zeros[i]))
                else:
                    ops.append(jnp.asarray(v.val))
            return eqn.primitive.bind(*ops, **eqn.params)

        offset = h({})  # out_tail-shaped constant part
        off_np = _np(offset).reshape(k_out).astype(np.float32)
        mats = []
        for i in walker_pos:
            v = invals[i]
            basis = jnp.eye(v.k, dtype=_val_dtype(v)).reshape(
                (v.k,) + v.tail)
            cols = jax.vmap(lambda e, _i=i: h({_i: e}))(basis)
            m = (_np(cols).reshape(v.k, k_out)
                 - off_np[None, :]).astype(np.float32)
            mats.append(m)
        return off_np, mats

    off_np, mats = _memo(store, (ek, "affine"), _materialise)

    if not fusable:
        # non-f32 walker values: eager blockdiag matmuls (original path)
        acc = None
        for j, i in enumerate(walker_pos):
            v = _materialize(invals[i], pack, store, (ek, "mat", i), reg)
            bd = _memo(store, (ek, "bd", j),
                       lambda m=mats[j], v=v: _blockdiag_np(
                           m, pack).astype(np.dtype(v.arr.dtype)))
            term = jnp.dot(v.arr, bd, preferred_element_type=v.arr.dtype)
            acc = term if acc is None else acc + term
        if np.any(off_np):
            acc = acc + _tile_const_np(
                off_np.reshape(out_tail) if out_tail else off_np[0], pack)
        return _Packed(acc, out_tail)

    # lazy composition: each walker operand contributes its terms
    # right-multiplied by this primitive's matrix; offsets accumulate
    result = None
    dtype = _val_dtype(invals[walker_pos[0]])
    for j, i in enumerate(walker_pos):
        contrib = _aff_compose(invals[i], mats[j], None, out_tail, dtype)
        result = contrib if result is None else _aff_add(
            result, contrib, out_tail)
    if np.any(off_np):
        off = off_np if result.off is None else result.off + off_np
        result = _Affine(result.terms, off, out_tail, dtype)
    return result


# ---------------------------------------------------------------------------
# Primitive substitution (surrogate trajectory gradients)
# ---------------------------------------------------------------------------

# Cheap algebraic stand-ins for the transcendentals that dominate
# data-heavy gradient loops on the VPU. sigma~(x) = 0.5 + 0.5 x/(1+|x|)
# (max abs error vs sigmoid ~0.047); tanh~(x) = x/(1+|x|). Monotone,
# bounded, correct asymptotes — a well-conditioned force field.
FAST_TRANSCENDENTAL_SUBS = {
    "logistic": lambda x: 0.5 + 0.5 * x / (1.0 + jnp.abs(x)),
    "tanh": lambda x: x / (1.0 + jnp.abs(x)),
}


def substitute_primitives(fun: Callable, subs: dict) -> Callable:
    """Return ``fun`` with selected primitives replaced by substitute
    implementations (jaxpr-level rewrite, recursing through pjit/custom
    call frames).

    Used for SURROGATE-GRADIENT trajectories: a leapfrog driven by ANY
    position-dependent force is volume-preserving and time-reversible,
    so replacing the force's transcendentals with cheap algebraic
    approximations — while the Metropolis test keeps the EXACT endpoint
    potential energies — leaves the stationary distribution exactly the
    target (standard surrogate/approximate-gradient MH argument). The
    only effect is a slightly different proposal map, visible as a small
    acceptance-rate shift. Measured on logreg_32_n256: the sigmoid chain
    Mosaic lowers for ``logistic`` costs ~2/3 of the fused kernel's time
    (133M t/s without transcendentals vs 41M with), so this is the
    difference between VPU-transcendental-bound and matmul-floor-bound.
    """
    def wrapped(*args):
        closed = jax.make_jaxpr(fun)(*args)

        def run(jaxpr, consts, vals):
            env = {}

            def read(v):
                if isinstance(v, jcore.Literal) \
                        or type(v).__name__ == "Literal":
                    return v.val
                return env[v]

            for var, c in zip(jaxpr.constvars, consts):
                env[var] = c
            for var, a in zip(jaxpr.invars, vals):
                env[var] = a
            for eqn in jaxpr.eqns:
                invals = [read(v) for v in eqn.invars]
                name = eqn.primitive.name
                if name in subs:
                    outs = [subs[name](*invals)]
                elif name in _CALLS:
                    sub_j, sub_c = _subjaxpr(eqn)
                    outs = run(sub_j, sub_c, invals[:len(sub_j.invars)])
                else:
                    outs = eqn.primitive.bind(*invals, **eqn.params)
                    if not eqn.primitive.multiple_results:
                        outs = [outs]
                for var, o in zip(eqn.outvars, outs):
                    env[var] = o
            return [read(v) for v in jaxpr.outvars]

        return tuple(run(closed.jaxpr, closed.consts, list(args)))
    return wrapped


def pack_for(num_dims: int) -> int:
    """Walkers per 128-lane row (raises if num_dims does not divide 128)."""
    if num_dims <= 0 or 128 % num_dims != 0:
        raise ValueError(
            f"packed layout needs D | 128; got D={num_dims}. "
            "Use pad_potential to embed in the next packable dimension.")
    return 128 // num_dims


def next_packable_dim(num_dims: int) -> int:
    """Smallest D' >= num_dims with D' | 128 (D <= 128 required)."""
    if num_dims > 128:
        raise ValueError(f"packed layout requires D <= 128; got {num_dims}")
    d = num_dims
    while 128 % d != 0:
        d += 1
    return d


def pad_potential(potential_fn: Callable, num_dims: int,
                  padded_dims: Optional[int] = None) -> Callable:
    """Embed a D-dim target in R^{D'} (D' | 128) by appending independent
    standard-normal auxiliary coordinates: U'(q') = U(q'[:D]) +
    0.5 |q'[D:]|^2. The first-D marginals of the padded target are exactly
    the original posterior; samplers report q'[..., :D].

    The returned potential carries ``orig_dims``/``padded_dims`` attributes
    and a composed ``analytic_grad`` when the base potential has one.
    """
    if padded_dims is None:
        padded_dims = next_packable_dim(num_dims)
    if padded_dims < num_dims:
        raise ValueError("padded_dims < num_dims")
    if padded_dims == num_dims:
        return potential_fn
    d, dp = num_dims, padded_dims

    def padded(q):
        extra = q[..., d:]
        return potential_fn(q[..., :d]) + 0.5 * jnp.sum(
            extra * extra, axis=-1)

    ag = getattr(potential_fn, "analytic_grad", None)
    if ag is not None:
        def padded_grad(q):
            return jnp.concatenate([ag(q[..., :d]), q[..., d:]], axis=-1)
        padded.analytic_grad = padded_grad  # type: ignore[attr-defined]
    padded.name = getattr(  # type: ignore[attr-defined]
        potential_fn, "name", "potential") + f"_pad{dp}"
    padded.orig_dims = d  # type: ignore[attr-defined]
    padded.padded_dims = dp  # type: ignore[attr-defined]
    return padded


def _dce(closed):
    """Drop equations whose outputs are unused (``make_jaxpr`` keeps dead
    code — tracing ``lambda q: vg(q)[1]`` still records the value's
    reductions, and a dead reduction is a whole blockdiag matmul per
    leapfrog step in the packed layout). Conservative backward sweep;
    primitives here are effect-free."""
    jaxpr = closed.jaxpr
    live = set(jaxpr.outvars)
    kept = []
    for eqn in reversed(jaxpr.eqns):
        if any(v in live for v in eqn.outvars):
            kept.append(eqn)
            for v in eqn.invars:
                if not (isinstance(v, jcore.Literal)
                        or type(v).__name__ == "Literal"):
                    live.add(v)
    kept.reverse()
    const_pairs = [(var, c) for var, c in zip(jaxpr.constvars, closed.consts)
                   if var in live]
    new_jaxpr = jaxpr.replace(
        eqns=kept, constvars=[v for v, _ in const_pairs])
    return jcore.ClosedJaxpr(new_jaxpr, [c for _, c in const_pairs])


def packed_transform(
    fun: Callable,
    num_dims: int,
    *,
    dtype=jnp.float32,
) -> Callable:
    """Packed-layout transform of an arbitrary per-walker function
    ``q: [D] -> tuple of per-walker arrays``: returns
    ``qp: [rows, P*D] -> tuple of [rows, P*k_i]`` with P = 128 // D.

    Raises :class:`PackedUnsupported` at build time if the function's
    jaxpr contains primitives outside the interpreter's coverage, so
    callers can fall back before compiling anything.
    """
    pack = pack_for(num_dims)
    closed = jax.make_jaxpr(fun)(
        jax.ShapeDtypeStruct((num_dims,), dtype))
    closed = _dce(closed)
    out_tails = [tuple(v.aval.shape) for v in closed.jaxpr.outvars]
    out_ks = [int(np.prod(t, dtype=np.int64)) if t else 1
              for t in out_tails]

    # build-time pass on a concrete probe: surfaces unsupported primitives
    # as PackedUnsupported here (not mid-compile) AND warms the constant
    # store so traced replays stage no constant-construction ops (critical
    # inside Pallas kernels — see _memo)
    store: dict = {}
    probe = jnp.zeros((1, pack * num_dims), dtype)
    _eval_packed(closed.jaxpr, closed.consts, [_Packed(probe, (num_dims,))],
                 pack, store)

    def packed_fun(qp: Array):
        rows = qp.shape[0]
        outs = _eval_packed(closed.jaxpr, closed.consts,
                            [_Packed(qp, (num_dims,))], pack, store)
        result = []
        for o, k in zip(outs, out_ks):
            arr = o.arr if isinstance(o, _Packed) else _tile_const_np(
                o.val, pack)
            result.append(jnp.broadcast_to(arr, (rows, pack * k)))
        return tuple(result)

    packed_fun.pack = pack  # type: ignore[attr-defined]
    packed_fun.num_dims = num_dims  # type: ignore[attr-defined]
    return packed_fun


def _vg_fun(potential_fn: Callable, use_analytic: bool) -> Callable:
    ag = getattr(potential_fn, "analytic_grad", None)
    if use_analytic and ag is not None:
        def fun(q):
            return potential_fn(q), ag(q)
        return fun
    return lambda q: jax.value_and_grad(potential_fn)(q)


def packed_value_and_grad(
    potential_fn: Callable,
    num_dims: int,
    *,
    dtype=jnp.float32,
    use_analytic: bool = True,
) -> Callable[[Array], tuple[Array, Array]]:
    """``qp: [rows, P*D] -> (U: [rows, P], grad: [rows, P*D])`` in the
    walker-packed layout (see module doc and :func:`packed_transform`)."""
    fun = _vg_fun(potential_fn, use_analytic)
    return packed_transform(fun, num_dims, dtype=dtype)


def packed_grad(
    potential_fn: Callable,
    num_dims: int,
    *,
    dtype=jnp.float32,
    use_analytic: bool = True,
    fast_subs: Optional[dict] = None,
) -> Callable[[Array], Array]:
    """Gradient-only packed evaluation: tracing only ``grad`` lets jax DCE
    the potential VALUE's final reductions out of the jaxpr — inside the
    fused trajectory loop the value is dead weight (it is only needed at
    the trajectory endpoints), and for packed layouts each dead reduction
    is a whole blockdiag matmul per leapfrog step.

    ``fast_subs``: optional primitive-substitution table applied to the
    gradient jaxpr (see :func:`substitute_primitives` — the
    surrogate-trajectory-force mechanism)."""
    fun = _vg_fun(potential_fn, use_analytic)
    grad_fun = lambda q: (fun(q)[1],)  # noqa: E731
    if fast_subs:
        grad_fun = substitute_primitives(grad_fun, fast_subs)
    pf = packed_transform(grad_fun, num_dims, dtype=dtype)

    def grad_only(qp: Array) -> Array:
        return pf(qp)[0]

    grad_only.pack = pf.pack  # type: ignore[attr-defined]
    grad_only.num_dims = num_dims  # type: ignore[attr-defined]
    return grad_only


def packed_value(
    potential_fn: Callable,
    num_dims: int,
    *,
    dtype=jnp.float32,
) -> Callable[[Array], Array]:
    """Value-only packed evaluation (trajectory endpoints)."""
    pf = packed_transform(lambda q: (potential_fn(q),), num_dims,
                          dtype=dtype)

    def value_only(qp: Array) -> Array:
        return pf(qp)[0]

    value_only.pack = pf.pack  # type: ignore[attr-defined]
    value_only.num_dims = num_dims  # type: ignore[attr-defined]
    return value_only
