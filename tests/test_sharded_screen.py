"""Production multi-device sharding of the column screen.

With >1 local device, screen_candidates routes through a shard_map over
the 'cols' mesh (ops/screen.py:_local_mesh) — the flagship `call` then
uses every local chip, per SURVEY §2.3 ("per-chip batches of pileup
columns").  These tests run on the 8-virtual-CPU-device mesh and assert
(a) the mesh is detected, (b) the mask is sharded across all devices,
(c) the sharded mask equals the single-device screen's, and (d) a full
`call` with the screen forced on matches the host-only VCF.
"""

import os

import numpy as np
import pytest

import jax

from lofreq_tpu.ops import screen as S


def _mk_inputs(B=512, s=32, seed=0):
    rng = np.random.default_rng(seed)
    probs = np.full((B, 64), 2.0)
    depths = rng.integers(5, 60, B).astype(np.int64)
    for i in range(B):
        probs[i, : depths[i]] = 10.0 ** (
            -rng.integers(10, 41, depths[i]) / 10.0)
    ks = rng.integers(1, 6, B).astype(np.int64)
    bonf = np.full(B, 1000.0)
    return probs, depths, ks, bonf


def test_local_mesh_detected():
    mesh = S._local_mesh()
    assert mesh is not None
    assert mesh.devices.size == 8  # conftest forces 8 virtual devices


def test_sharded_mask_matches_single_device():
    probs, depths, ks, bonf = _mk_inputs(seed=3)
    os.environ["LOFREQ_TPU_DEVICE_SCREEN"] = "1"
    try:
        got = S.screen_candidates(probs, depths, ks, bonf, 0.01)
    finally:
        del os.environ["LOFREQ_TPU_DEVICE_SCREEN"]
    single = S._build_screen_fn(use_pallas=False, mesh=None)
    B, D = probs.shape
    s = min(S._bucket(D), S.TOP_S)
    Bp = S._bucket_b(B)
    prefix = np.full((Bp, s), 2.0)
    prefix[:B, :D if D <= s else s] = probs[:, :s] if D <= s else 0
    # reuse the production packer for identical quantization: compare
    # against a fresh single-device run of the same jitted body instead
    # by re-deriving codes exactly as screen_candidates does
    in_depth = np.arange(D)[None, :] < depths[:, None]
    arr = np.where((probs <= 1.0) & in_depth, probs, 0.0)
    if D > s:
        prefix[:B] = np.partition(arr, D - s, axis=1)[:, D - s:]
        depths_p = np.full(Bp, s, np.int32)
    else:
        prefix[:B, :D] = probs
        depths_p = np.zeros(Bp, np.int32)
        depths_p[:B] = depths
    with np.errstate(divide="ignore", invalid="ignore"):
        lg = np.ceil(-np.log2(np.maximum(prefix, 1e-300)) * 8.0)
    codes = np.where((prefix <= 0.0) | (prefix > 1.0) | (lg > 254), 255,
                     np.clip(lg, 0, 254)).astype(np.uint8)
    ks_p = np.ones(Bp, np.int32)
    ks_p[:B] = np.maximum(ks, 1)
    lt = np.full(Bp, np.float32(np.log(0.01 * S.MARGIN)))
    lt[:B] = np.log(0.01 * S.MARGIN / bonf).astype(np.float32)
    want = np.asarray(single(codes, depths_p, ks_p, lt, s=s))[:B]
    assert np.array_equal(got, want)


def test_screen_output_is_sharded_across_devices():
    mesh = S._local_mesh()
    fn = S._build_screen_fn(use_pallas=False, mesh=mesh)
    B, s = 512, 32
    codes = np.full((B, s), 255, np.uint8)
    depths = np.zeros(B, np.int32)
    ks = np.ones(B, np.int32)
    lt = np.zeros(B, np.float32)
    out = fn(codes, depths, ks, lt, s=s)
    shards = {sh.device for sh in out.addressable_shards}
    assert len(shards) == 8, f"mask on {len(shards)} devices"


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_call_screen_on_matches_host(tmp_path):
    from simulate import simulate

    from lofreq_tpu.call.caller import VarcallConf
    from lofreq_tpu.pipelines.call_pipeline import run_call

    art = simulate(str(tmp_path), genome_len=4000, depth=300, seed=17,
                   snvs=((0.1, 3), (0.5, 2)))
    host = run_call(art["bam"], art["fa"],
                    vconf=VarcallConf(use_device_screen=False,
                                      use_device_baq=False))
    dev = run_call(art["bam"], art["fa"],
                   vconf=VarcallConf(use_device_screen=True,
                                     use_device_baq=False))
    hv = [(v.pos, v.ref, v.alt, v.qual, v.info) for v in host.vars]
    dv = [(v.pos, v.ref, v.alt, v.qual, v.info) for v in dev.vars]
    assert hv == dv and len(hv) >= 5
    assert host.stats.num_snv_tests == dev.stats.num_snv_tests
