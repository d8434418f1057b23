"""Gradient-based fitting of compressed tensors.

Behavioral reference: /root/reference/tntorch/autodiff.py:10-121. The TPU
rebuild improves on the reference's eager loop: the whole
loss -> grad -> optimizer update step is jit-compiled once (cores are pytree
leaves), so each iteration is a single XLA dispatch instead of hundreds of
eager kernel launches.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn

# Every way a loss can concretize a tracer (float()/bool()/int()/np.asarray
# on a traced value): these siblings share no single parent short of
# JAXTypeError, so catch them as a tuple to route the loss to the eager path
_NON_TRACEABLE_ERRORS = (
    jax.errors.TracerArrayConversionError,
    jax.errors.TracerIntegerConversionError,
    jax.errors.ConcretizationTypeError,  # covers TracerBoolConversionError
)


def _get_params(tensors):
    """Extract trainable leaves: cores/Us of tensors flagged requires_grad."""
    params = {}
    for i, t in enumerate(tensors):
        if isinstance(t, tn.Tensor):
            # Batch tensors train like any other: the cores are pytree
            # leaves whatever their rank, and an elementwise optimizer with
            # a per-sample-separable loss updates each sample independently
            # (the reference rejects batch here, autodiff.py:39-40 — one
            # more case of SURVEY.md §7's "batch disappears" claim).
            if t.requires_grad:
                frozen = getattr(t, "frozen_Us", ())
                params[i] = {
                    "cores": list(t.cores),
                    # Frozen factors (set_factors(..., requires_grad=False))
                    # are closure constants, not trainable leaves
                    "Us": {m: U for m, U in enumerate(t.Us)
                           if U is not None and m not in frozen},
                }
        elif getattr(t, "requires_grad", False):
            # JAX arrays are immutable, so a trained bare array could never
            # be written back to the caller — silently dropping the result
            # would be worse than refusing (the reference's torch path works
            # only because torch mutates parameters in place)
            raise ValueError(
                "optimize() can only train tn.Tensor inputs (position {}): "
                "wrap the parameter in a tn.Tensor (e.g. a 1-mode tensor) so "
                "the trained value can be written back".format(i)
            )
    return params


def _set_params(tensors, params):
    out = []
    for i, t in enumerate(tensors):
        if i in params and isinstance(t, tn.Tensor):
            t2 = t.clone()
            t2.cores = list(params[i]["cores"])
            us = params[i]["Us"]
            t2.Us = [us.get(m, U) for m, U in enumerate(t.Us)]
            out.append(t2)
        elif i in params:
            out.append(params[i])
        else:
            out.append(t)
    return out


def optimize(
    tensors,
    loss_function: Callable,
    optimizer: Optional[Any] = None,
    tol: float = 1e-4,
    max_iter: float = 1e4,
    print_freq: int = 500,
    verbose: bool = True,
    use_jit: bool = True,
    block_iters: int = 1,
    mesh=None,
):
    """Iterative learning driver: optimizes the cores/factors of every input
    tensor flagged `requires_grad` against `loss_function`, in place.

    Stopping criterion mirrors the reference (autodiff.py:67-76): loss (or its
    relative improvement) below `tol` while the improvement rate decelerates.

    Batch tensors are trainable (the reference rejects them): with a scalar
    loss that sums per-sample terms (e.g. ``jnp.sum(tn.normsq(...))``), an
    elementwise optimizer fits every ensemble member independently in one
    loop — B fits for one dispatch stream.

    :param optimizer: an optax GradientTransformation (default optax.adam(1e-3),
        matching the reference's torch.optim.Adam default)
    :param use_jit: jit-compile the update step (requires a traceable loss)
    :param block_iters: run this many update steps per device dispatch (a
        jitted lax.scan). On accelerators with high host round-trip latency,
        block_iters=32..128 removes the per-iteration sync; convergence is
        then checked once per block on the block's loss history.
    :param mesh: optional jax.sharding.Mesh for data-parallel training: the
        trainable cores/factors are replicated across the mesh, and when the
        loss closure consumes data sharded over the mesh's batch axis (see
        ``tn.parallel.shard_array``), XLA's SPMD partitioner evaluates the
        loss shard-locally and all-reduces (psum) the gradients — the
        standard dp recipe, with no change to the loss code.
    """
    import optax

    if not isinstance(tensors, (list, tuple)):
        tensors = [tensors]
    tensors = list(tensors)

    params = _get_params(tensors)
    if len(params) == 0:
        raise ValueError(
            "There are no parameters to optimize. Did you forget a requires_grad=True somewhere?"
        )
    if mesh is not None:
        from tntorch_tpu.parallel.algorithms import replicate_pytree

        params = replicate_pytree(params, mesh)

    if optimizer is None:
        optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def total_loss_fn(p):
        ts = _set_params(tensors, p)
        loss = loss_function(*ts)
        if not isinstance(loss, (tuple, list)):
            loss = [loss]
        return sum(jnp.asarray(l) for l in loss), [jnp.asarray(l) for l in loss]

    def step(p, s):
        (tl, losses), grads = jax.value_and_grad(total_loss_fn, has_aux=True)(p)
        updates, s = optimizer.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return p, s, tl, losses

    def block_step(p, s):
        # K update steps in one XLA program: no host sync inside the block
        def body(carry, _):
            p, s = carry
            p, s, tl, losses = step(p, s)
            return (p, s), (tl, losses)

        (p, s), (tls, losses) = jax.lax.scan(body, (p, s), None, length=block_iters)
        return p, s, tls, losses

    if use_jit:
        try:
            step = jax.jit(step)
            block_step = jax.jit(block_step)
        except Exception:
            pass

    losses_hist = []
    converged = False
    start = time.time()
    it = 0
    loss_parts = None
    while block_iters > 1:
        # Blocked mode: fetch the whole block's loss history in one sync
        try:
            with tn.utils.trace_annotation("tn.optimize:block_step"):
                params, opt_state, tls, parts = block_step(params, opt_state)
        except _NON_TRACEABLE_ERRORS:
            block_iters = 1
            break
        tls = np.asarray(tls)
        losses_hist.extend(float(v) for v in tls)
        loss_parts = [p[-1] for p in parts] if isinstance(parts, (tuple, list)) else [tls[-1]]
        it += block_iters
        if len(losses_hist) >= 3 and tol is not None:
            l3, l2, l1 = losses_hist[-3], losses_hist[-2], losses_hist[-1]
            delta = l1 - l2
            if (l1 <= tol or 0 <= -delta / l1 <= tol) and l2 - l1 < l3 - l2:
                converged = True
                break
        if it >= max_iter:
            break
        if verbose and it % max(print_freq, block_iters) < block_iters:
            _print_status(it, max_iter, loss_parts, losses_hist, start)
            print()
    if block_iters > 1:
        _finalize(tensors, params, converged, tol, max_iter, verbose,
                  it, loss_parts, losses_hist, start)
        return losses_hist

    while True:
        try:
            params, opt_state, total_loss, loss_parts = step(params, opt_state)
        except _NON_TRACEABLE_ERRORS:
            # Loss not jittable (e.g. data-dependent shapes via cross): fall
            # back to per-call tracing. Value concretization (float()/bool()
            # on a traced value) fails under eager grad too — surface that
            # as a clear error instead of a raw tracer message.
            import warnings

            warnings.warn(
                "loss_function is not jit-traceable (typically because it "
                "calls tn.cross or a cross-based op like **, tensor /, "
                "tn.exp), so optimize() falls back to EAGER mode: "
                "jax.value_and_grad re-traces the whole loss every "
                "iteration, typically 10-100x slower. See MIGRATION.md "
                "('The optimize retrace cliff') for workarounds "
                "(re-parameterize, or precompute with detach_evaluations).",
                stacklevel=2,
            )
            step = lambda p, s: _eager_step(p, s, optimizer, total_loss_fn)
            try:
                params, opt_state, total_loss, loss_parts = step(params, opt_state)
            except _NON_TRACEABLE_ERRORS as e:
                raise ValueError(
                    "loss_function converts a traced value to a Python "
                    "scalar (float()/bool()/int()), which JAX cannot "
                    "differentiate; use jnp ops (jnp.where, lax.cond) on "
                    "the value instead"
                ) from e
        losses_hist.append(float(total_loss))

        if len(losses_hist) >= 2:
            delta_loss = losses_hist[-1] - losses_hist[-2]
        else:
            delta_loss = float("-inf")
        # Converged when the loss is below tol, or improved by a relative
        # amount below tol while decelerating. NOTE: unlike the reference
        # (autodiff.py:67-76), a transient loss *increase* (delta > 0, common
        # with Adam at higher learning rates) does not count as convergence.
        if (
            it >= 2
            and tol is not None
            and (losses_hist[-1] <= tol or 0 <= -delta_loss / losses_hist[-1] <= tol)
            and losses_hist[-2] - losses_hist[-1] < losses_hist[-3] - losses_hist[-2]
        ):
            converged = True
            break
        if it == max_iter:
            break
        if verbose and it % print_freq == 0:
            _print_status(it, max_iter, loss_parts, losses_hist, start)
            print()
        it += 1

    _finalize(tensors, params, converged, tol, max_iter, verbose,
              it, loss_parts, losses_hist, start)
    return losses_hist


def _finalize(tensors, params, converged, tol, max_iter, verbose,
              it, loss_parts, losses_hist, start):
    """Write trained cores/factors back in place and print the exit status
    (shared by the blocked and per-step exits)."""
    final = _set_params(tensors, params)
    for t, tf in zip(tensors, final):
        if isinstance(t, tn.Tensor) and t.requires_grad:
            t.cores = tf.cores
            t.Us = tf.Us
    if verbose:
        _print_status(it, max_iter, loss_parts, losses_hist, start)
        if converged:
            print(" <- converged (tol={})".format(tol))
        else:
            print(" <- max_iter was reached: {}".format(max_iter))


def _eager_step(p, s, optimizer, total_loss_fn):
    import optax

    (tl, losses), grads = jax.value_and_grad(total_loss_fn, has_aux=True)(p)
    updates, s = optimizer.update(grads, s, p)
    p = optax.apply_updates(p, updates)
    return p, s, tl, losses


def _print_status(it, max_iter, loss_parts, losses_hist, start):
    print("iter: {: <{}} | loss: ".format(it, len("{}".format(max_iter))), end="")
    print(" + ".join("{:10.6f}".format(float(l)) for l in loss_parts), end="")
    if len(loss_parts) > 1:
        print(" = {:10.4}".format(losses_hist[-1]), end="")
    print(" | total time: {:9.4f}".format(time.time() - start), end="")


def dof(t):
    """Degrees of freedom: total size of trainable nodes (reference autodiff.py:104-121)."""
    if not getattr(t, "requires_grad", False):
        return 0
    frozen = getattr(t, "frozen_Us", ())
    result = 0
    for n in range(t.dim()):
        result += int(np.prod(t.cores[n].shape))
        if t.Us[n] is not None and n not in frozen:
            result += int(np.prod(t.Us[n].shape))
    return result
