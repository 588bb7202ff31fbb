"""Device (JAX) BAQ vs the exact native C BAQ."""

import numpy as np
import pytest

from lofreq_tpu.io.bam import BamRead
from lofreq_tpu.ops.baq_hmm import realn_batch
from lofreq_tpu.ops.baq_jax import baq_batch_jax, extract_baq


def test_baq_jax_matches_c():
    rng = np.random.default_rng(17)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000)
    ref = genome.tobytes()
    L = 100
    B = 64
    reads = []
    infos = []
    for i in range(B):
        pos = int(rng.integers(10, 3800))
        r = BamRead()
        r.qname = f"j{i}"
        r.tid = 0
        r.pos = pos
        seq = genome[pos : pos + L].copy()
        # a few mismatches
        for _ in range(int(rng.integers(0, 4))):
            at = int(rng.integers(0, L))
            b = seq[at]
            while b == seq[at]:
                b = rng.choice(np.frombuffer(b"ACGT", np.uint8))
            seq[at] = b
        r.seq = seq.tobytes()
        r.qual = rng.integers(10, 41, L).astype(np.uint8)
        r.set_cigar_string(f"{L}M")
        reads.append(r)
        xb = max(pos - 3, 0)
        xe = min(pos + L + 3, len(ref))
        infos.append((pos, r.seq, r.qual, xb, xe))

    # exact C BAQ
    realn_batch(reads, ref, baq=True, ext_baq=True, idaq=False)
    c_baq = np.stack([
        np.frombuffer(r.get_tag("lb").encode("latin-1"), np.uint8) - 33
        for r in reads
    ]).astype(np.int64)

    # device BAQ
    q, state = baq_batch_jax(infos, ref)
    j_baq = np.stack([
        extract_baq(q[i], state[i], infos[i][0], infos[i][3])
        for i in range(B)
    ]).astype(np.int64)

    diff = np.abs(c_baq - j_baq)
    frac_exact = (diff == 0).mean()
    assert frac_exact > 0.97, f"only {frac_exact:.3f} exact"
    assert diff.max() <= 2, f"max phred diff {diff.max()}"


def test_pallas_baq_matches_jax_path():
    """The Pallas fwd/bwd kernels reproduce the XLA device BAQ exactly
    (interpret mode on CPU; on hardware f32 op-order gives <=±1 phred)."""
    import numpy as np
    import jax.numpy as jnp

    from lofreq_tpu.ops.baq_jax import _build as jbuild
    from lofreq_tpu.ops.pallas_baq import baq_pallas

    rng = np.random.default_rng(4)
    B, L, Lr = 128, 100, 128
    refw = rng.integers(0, 4, (B, Lr)).astype(np.int32)
    query = np.array([refw[b, 5:5 + L] for b in range(B)], np.int32)
    err = rng.random((B, L)) < 0.05
    query[err] = rng.integers(0, 4, err.sum())
    qualp = (10 ** (-rng.integers(15, 41, (B, L)) / 10)).astype(np.float32)
    l_ref = rng.integers(108, 128, B).astype(np.int32)

    qj, sj, *_ = jbuild(L, Lr, 7)(
        jnp.asarray(refw), jnp.asarray(query), jnp.asarray(qualp),
        jnp.asarray(l_ref))
    qp, sp = baq_pallas(refw, query, qualp, l_ref)
    assert np.array_equal(qp, np.asarray(qj))
    assert np.array_equal(sp, np.asarray(sj))
