"""Batched anchored least-squares — the fusion solver.

TPU-native replacement for the reference's per-layer sequential LBFGS with
strong-Wolfe line search (gradient_fusion.py:38-96: 500 iters/layer text
encoder, 50/layer UNet). Two observations make a closed form exact:

  1. Every fusion target is linear in the captured inputs: V_c = X_c @ Wm_c
     (the concept-merged layer applied to that concept's activations,
     gradient_fusion.py:397-429 and the hook-captured outputs-minus-bias).
     Therefore the least-squares problem only needs GRAM matrices
     G_c = X_cᵀ X_c and the (small) LoRA deltas — no feature storage:
        min_W Σ_c ‖X_c W − X_c Wm_c‖²     (W in (in, out) kernel layout)
        ⇔  (Σ_c G_c) ΔW = Σ_c G_c (Wm_c − W₀),   W = W₀ + ΔW
  2. A quadratic objective optimized from W₀ by an iterative method (what
     LBFGS-from-W₀ approximates) converges to the minimizer closest to W₀ —
     i.e. ΔW restricted to the row space of the inputs. The spectral solve
     below computes exactly that: eigendecompose G, invert only retained
     eigendirections, leave the null space at the anchor. Solving for the
     (small) delta rather than W keeps fp32 rounding noise from being
     amplified through near-zero eigenvalues.

  On TPU this turns hours of per-layer line searches into one batched eigh
  solve vmapped over layers (shardable over the mesh's 'model' axis), with
  a smaller residual than truncated LBFGS by construction.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gram(x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """XᵀX over all leading dims: x (..., N, F) → (F, F), fp32 accumulate.

    `mask` (..., N) zeroes padded rows (e.g. tokenizer padding — the
    reference avoids them via do_not_pad, gradient_fusion.py:188-195)."""
    xf = x.astype(jnp.float32)
    if mask is not None:
        xf = xf * mask.astype(jnp.float32)[..., None]
    xf = xf.reshape(-1, xf.shape[-1])
    # precision pin: fp32 TPU matmuls default to bf16-input passes; this
    # gram feeds an eigh with rank_tol=1e-6 (ADVICE r4 medium)
    return jnp.dot(xf.T, xf, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


@jax.jit
def anchored_spectral_solve(g_sum: jnp.ndarray, d_sum: jnp.ndarray,
                            w0: jnp.ndarray, lam: jnp.ndarray,
                            rank_tol: jnp.ndarray) -> jnp.ndarray:
    """W = W₀ + V ((VᵀD) / (e + λ·e_max)) restricted to e > tol·e_max.

    g_sum: (F, F) summed input Gram; d_sum: (F, O) = Σ_c G_c (Wm_c − W₀);
    w0: (F, O) anchor in kernel layout; lam: relative ridge inside the
    retained spectrum; rank_tol: relative eigenvalue cutoff below which
    directions are treated as unobserved (ΔW = 0 there — the anchor wins).
    """
    e, v = jnp.linalg.eigh(g_sum)
    emax = jnp.maximum(e[-1], 1e-30)
    keep = e > rank_tol * emax
    inv = jnp.where(keep, 1.0 / (e + lam * emax), 0.0)
    dw = v @ (inv[:, None] * (v.T @ d_sum))
    return w0 + dw


@jax.jit
def _batched_solve(g, d, w0, lam, rank_tol):
    return jax.vmap(anchored_spectral_solve,
                    in_axes=(0, 0, 0, None, None))(g, d, w0, lam, rank_tol)


@functools.partial(jax.jit, static_argnames=('iters',))
def _batched_lbfgs(g, d, w0, iters: int):
    """Iterative alternative: optax LBFGS (zoom linesearch) on the quadratic
    ½tr(ΔᵀGΔ) − tr(ΔᵀD) in delta space, vmapped over layers — the literal
    counterpart of the reference's torch.optim.LBFGS loop
    (gradient_fusion.py:78-85). The spectral solve is this problem's exact
    optimum; this path exists for parity validation and as a fallback."""
    import optax

    def solve_one(g1, d1, w01):
        def obj(dw):
            return 0.5 * jnp.vdot(dw, g1 @ dw) - jnp.vdot(dw, d1)

        opt = optax.lbfgs()
        dw0 = jnp.zeros_like(d1)
        state0 = opt.init(dw0)
        vg = jax.value_and_grad(obj)

        def body(carry, _):
            dw, state = carry
            value, grad = vg(dw)
            updates, state = opt.update(
                grad, state, dw, value=value, grad=grad, value_fn=obj)
            return (optax.apply_updates(dw, updates), state), None

        (dw, _), _ = jax.lax.scan(body, (dw0, state0), None, length=iters)
        return w01 + dw

    return jax.vmap(solve_one)(g, d, w0)


@jax.jit
def _residual_core_batch(g, d, wn, w0):
    """tr(ΔᵀGΔ) − 2tr(ΔᵀD) per layer over a stacked (B, F, O) group — the
    Wn-dependent part of Σ_c‖X_c(Wn − Wm_c)‖², the optimization diagnostic
    the reference logs after LBFGS (gradient_fusion.py:87-95)."""
    dw = (wn - w0).astype(jnp.float32)
    # precision pin: TPU fp32 einsums default to bf16-input passes (~5e-4
    # relative on this diagnostic, measured on-chip r5)
    hi = jax.lax.Precision.HIGHEST
    return (jnp.einsum('bfo,bfe,beo->b', dw, g.astype(jnp.float32), dw,
                       precision=hi)
            - 2.0 * jnp.einsum('bfo,bfo->b', dw, d.astype(jnp.float32),
                               precision=hi))


def stack_for_device(arrs) -> jnp.ndarray:
    """Stack a same-shape list to a device (B, ...) fp32 array. All-host
    lists stack host-side first so the tunnel sees ONE transfer; any device
    member forces the element-wise jnp path (device stacks are free)."""
    if all(isinstance(a, np.ndarray) for a in arrs):
        return jnp.asarray(np.stack([a.astype(np.float32, copy=False)
                                     for a in arrs]))
    return jnp.stack([jnp.asarray(a, jnp.float32) for a in arrs])


def solve_layer_group(grams: List[np.ndarray], deltas: List[np.ndarray],
                      anchors: List[np.ndarray],
                      lam: float = 1e-4,
                      rank_tol: float = 1e-6,
                      method: str = 'exact',
                      iters: int = 50,
                      device_out: bool = False,
                      with_residuals: bool = False):
    """Solve many layers at once, grouping same-shape layers into one
    batched (vmapped) solve. All arrays are kernel-layout (F, O);
    `deltas[i]` = Σ_c G_c (Wm_c − W₀) for layer i. Inputs may be host
    numpy or device arrays.

    method: 'exact' (spectral, default) or 'lbfgs' (iterative parity path).
    device_out=True keeps the solved kernels on device (the fusion phases
    feed them straight back into device-resident params — fetching them
    per-layer over a remote-device tunnel costs ~1 s latency each, r4).
    with_residuals=True additionally returns a per-layer list of the fit
    residual core tr(ΔᵀGΔ) − 2tr(ΔᵀD) (the reference's post-LBFGS
    diagnostic, gradient_fusion.py:87-95), computed here while the stacked
    group buffers are live rather than re-stacked by the caller — the
    spatial phase's grams/deltas are multi-GB on a 16 GB v5e (ADVICE r4)."""
    order: dict[Tuple[int, int], List[int]] = {}
    for i, (g, t) in enumerate(zip(grams, deltas)):
        order.setdefault((g.shape[0], t.shape[1]), []).append(i)

    out: List[np.ndarray] = [None] * len(grams)  # type: ignore
    res: List[float] = [0.0] * len(grams)
    for shape, idxs in order.items():
        g = stack_for_device([grams[i] for i in idxs])
        d = stack_for_device([deltas[i] for i in idxs])
        w = stack_for_device([anchors[i] for i in idxs])
        if method == 'lbfgs':
            solved = _batched_lbfgs(g, d, w, iters)
        else:
            solved = _batched_solve(g, d, w, jnp.float32(lam),
                                    jnp.float32(rank_tol))
        if with_residuals:
            r = np.asarray(_residual_core_batch(g, d, solved, w))
            for j, i in enumerate(idxs):
                res[i] = float(r[j])
        if not device_out:
            solved = np.asarray(solved)
        for j, i in enumerate(idxs):
            out[i] = solved[j]
    return (out, res) if with_residuals else out
