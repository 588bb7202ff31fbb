"""Device (JAX) significance screening for the Poisson-binomial test.

The reference prunes per column with a data-dependent early exit
(snpcaller.c:950): with ascending-sorted error probs, the running tail
P(X >= K) only grows, so once the partial tail exceeds sig/bonf the column
is insignificant.  On TPU we make this compiler-friendly: a fixed-length
linear-space f32 DP over the (bucket-padded) sorted probs yields a lower
bound of the tail; columns whose bound already exceeds (sig * MARGIN) / bonf
can never be called and are screened out.  Everything else is confirmed by
the exact native DP.

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
        """probs [B, s] f32 ascending (2.0 = padding); depths [B]; ks [B]
        (>=1); log_thresh [B] = log(sig * MARGIN / bonf).
        Returns candidate mask [B] (True = needs exact confirmation).

        Linear f32 space: each step is pure multiply-add; a p=0 read
        multiplies every cell by (1-p)=1, so padding and rows beyond a
        column's depth map to an exact identity (masked to 0 up front).
        Underflow only shrinks the partial tail, which only adds
        candidates — the safe, conservative direction."""
        B = probs.shape[0]
        kc = jnp.minimum(ks, kmax)
        cell = jnp.arange(kmax + 1)[None, :]
        is_tail = (cell == kc[:, None]).astype(jnp.float32)
        not_beyond = (cell <= kc[:, None]).astype(jnp.float32)
        state0 = jnp.where(cell == 0, 1.0, 0.0).astype(jnp.float32)
        state0 = jnp.broadcast_to(state0, (B, kmax + 1))
        in_depth = jnp.arange(s)[None, :] < depths[:, None]
        p_all = jnp.clip(
            jnp.where(in_depth & (probs <= 1.5), probs, 0.0), 0.0, 1.0)

        def step(state, p):
            shifted = jnp.concatenate(
                [state[:, :1] * 0.0, state[:, :-1]], axis=1)
            adv = shifted * p[:, None]
            std = state * (1.0 - p)[:, None] + adv
            tail = state + adv
            new = (is_tail * tail + (1.0 - is_tail) * std) * not_beyond
            return new, None

        state, _ = jax.lax.scan(step, state0, p_all.T, unroll=16)
        lin_tail = jnp.take_along_axis(state, kc[:, None], axis=1)[:, 0]
        tail_val = jnp.log(jnp.maximum(lin_tail, jnp.float32(1e-37)))
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
