"""Device (JAX) significance screening for the Poisson-binomial test.

The reference prunes per column with a data-dependent early exit
(snpcaller.c:950): with ascending-sorted error probs, the running tail
P(X >= K) only grows, so once the partial tail exceeds sig/bonf the column
is insignificant.  On TPU we make this compiler-friendly: a *fixed-length*
DP over the S smallest error probs yields a lower bound of the tail; columns
whose bound already exceeds (sig * MARGIN) / bonf can never be called and
are screened out.  Everything else is confirmed by the exact native DP.

The screen is conservative by construction (lower bound + f32 margin), so
final output is identical to running the exact DP everywhere.
"""

from __future__ import annotations

from functools import partial

import numpy as np

SCREEN_S = 32  # DP prefix length
KMAX = 16  # clipped tail cell (tail at smaller k bounds tail at k)
MARGIN = 1e3  # screening slack for f32 drift + running-bonf growth
NEG = -1e30


def _get_jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


@partial(lambda f: f)
def _build_screen_fn():
    jax, jnp = _get_jax()

    @partial(jax.jit, static_argnames=("s", "kmax"))
    def screen(probs, depths, ks, log_thresh, s=SCREEN_S, kmax=KMAX):
        """probs [B, s] f32 ascending; depths [B]; ks [B] (>=1);
        log_thresh [B] = log(sig * MARGIN / bonf).
        Returns candidate mask [B] (True = needs exact confirmation)."""
        B = probs.shape[0]
        kc = jnp.minimum(ks, kmax)
        cell = jnp.arange(kmax + 1)[None, :]
        is_tail = cell == kc[:, None]
        beyond = cell > kc[:, None]
        state0 = jnp.where(cell == 0, 0.0, NEG).astype(jnp.float32)
        state0 = jnp.broadcast_to(state0, (B, kmax + 1))

        def step(state, n_and_p):
            n, p = n_and_p
            p = jnp.clip(p, 1e-30, 1.0 - 1e-7)
            lp = jnp.log(p)
            l1p = jnp.log1p(-p)
            shifted = jnp.concatenate(
                [jnp.full((B, 1), NEG, jnp.float32), state[:, :-1]], axis=1
            )
            std = jnp.logaddexp(state + l1p[:, None], shifted + lp[:, None])
            tail = jnp.logaddexp(state, shifted + lp[:, None])
            new = jnp.where(is_tail, tail, std)
            new = new.at[:, 0].set(state[:, 0] + l1p)
            new = jnp.where(beyond, NEG, new)
            active = (n < depths)[:, None]
            return jnp.where(active, new, state), None

        ns = jnp.arange(s)
        state, _ = jax.lax.scan(step, state0, (ns, probs.T))
        tail_val = jnp.take_along_axis(state, kc[:, None], axis=1)[:, 0]
        # candidate if the lower bound is below the (slackened) threshold;
        # K beyond the clipped tail cell can't be ruled out (clipped tail
        # is an upper bound there)
        return (tail_val < log_thresh) | (ks > kmax)

    return screen


_screen_jit = None


def _bucket(n: int) -> int:
    """Round depth up to a power of two (bounds jit recompiles)."""
    b = 32
    while b < n:
        b *= 2
    return b


def screen_candidates(probs, depths, ks, bonf, sig) -> np.ndarray:
    """Host wrapper: probs [B, D] float64 ascending-sorted (padded with 2.0);
    returns boolean candidate mask.  Runs the *full-depth* f32 DP on device,
    so the screen resolves every column up to the f32 margin and K clipping
    (both conservative)."""
    global _screen_jit
    _jax, jnp = _get_jax()
    if _screen_jit is None:
        _screen_jit = _build_screen_fn()
    B, D = probs.shape
    s = _bucket(D)
    prefix = np.full((B, s), 2.0, dtype=np.float32)
    prefix[:, :D] = probs
    depths = np.asarray(depths, dtype=np.int32)
    ks = np.maximum(np.asarray(ks, dtype=np.int32), 1)
    bonf = np.broadcast_to(np.asarray(bonf, dtype=np.float64), (B,))
    log_thresh = np.log(sig * MARGIN / bonf).astype(np.float32)
    mask = _screen_jit(
        jnp.asarray(prefix), jnp.asarray(depths), jnp.asarray(ks),
        jnp.asarray(log_thresh), s=s,
    )
    return np.asarray(mask)
