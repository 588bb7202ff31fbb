"""Multi-host / multi-chip execution helpers.

Design (SURVEY §2.3 mapping): the genome is the long axis.
  * DCN level (hosts): contiguous region bins assigned per host by the
    greedy-bisection scheduler — each host streams its regions' reads from
    its BAM replica (BAI random access), exactly like the reference's
    process-parallel wrapper but across machines.
  * ICI level (chips of one host): column batches sharded over the "cols"
    mesh axis via shard_map (ops.device_call.build_sharded_column_call);
    the tested-column counter is psum'd on-device.
  * Global reduction: per-host (num_snv_tests, num_indel_tests) counters
    are all-reduced so the final dynamic-Bonferroni threshold is identical
    on every host (the reference sums them by parsing worker logs).
  * Output: each host writes its regions' VCF shard; shards concatenate in
    region order (region order == genome order by construction).

Everything here degrades gracefully to a single process so it can be
exercised on the CPU-device mesh in tests.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(coordinator: str = None, num_processes: int = None,
               process_id: int = None):
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("LOFREQ_TPU_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_mesh(axis: str = "cols"):
    """Mesh over this process's addressable devices."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.local_devices())
    return Mesh(devs, (axis,))


def global_mesh(axis: str = "cols"):
    """Mesh over all devices in the (possibly multi-host) runtime."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    return Mesh(devs, (axis,))


def host_region_assignment(bins, num_hosts: int, host_id: int):
    """Round-robin contiguous assignment of region bins to hosts, keeping
    genome order within each host (so shard concatenation stays sorted)."""
    return [b for i, b in enumerate(bins) if i % num_hosts == host_id]


def allreduce_counters(local_counts, mesh=None):
    """Sum per-PROCESS scalar counters across the runtime (and act as a
    barrier).  local_counts: dict[str, int].

    Uses multihost_utils.process_allgather — the per-process collective —
    rather than a device-mesh psum: a psum over replicated inputs computes
    the mean of per-process values, not the sum (each process feeds its
    local array as the full replicated global)."""
    import jax

    del mesh
    keys = sorted(local_counts)
    vals = np.asarray([float(local_counts[k]) for k in keys])
    if jax.process_count() == 1:
        return dict(local_counts)
    from jax.experimental import multihost_utils

    gathered = np.asarray(multihost_utils.process_allgather(vals))
    totals = gathered.reshape(jax.process_count(), -1).sum(axis=0)
    return {k: int(round(float(totals[i]))) for i, k in enumerate(keys)}


def run_distributed_call(bam_path, ref_path, vconf_kw, pconf_kw,
                         out_prefix, threads_per_host=1):
    """Multi-host region-parallel call: each process handles its assigned
    bins, counters are all-reduced, and each process writes
    `{out_prefix}.shard{pid}.vcf` plus (on process 0 after reduction) the
    threshold info needed for the final merge+filter.

    Single-process fallback returns the same structure as
    pipelines.parallel_call.run_parallel_regions.
    """
    import jax

    from ..pipelines.parallel_call import (
        bins_from_bamheader,
        make_job,
        sort_bins,
        split_bins,
    )

    pid = jax.process_index()
    nproc = jax.process_count()
    bins, chrom_order = bins_from_bamheader(bam_path)
    bins = sort_bins(split_bins(bins, max(threads_per_host * nproc, 1)),
                     chrom_order)
    mine = host_region_assignment(bins, nproc, pid)

    lines = []
    n_snv = 0
    n_indel = 0
    from ..pipelines.parallel_call import _worker

    for chrom, s, e in mine:
        ls, a, b = _worker(make_job(bam_path, ref_path, chrom, s, e,
                                    vconf_kw, pconf_kw))
        lines.extend(ls)
        n_snv += a
        n_indel += b

    # write the shard BEFORE the counter all-reduce: the blocking
    # collective then doubles as the barrier that guarantees every
    # process's shard is on disk when process 0 merges
    shard_path = f"{out_prefix}.shard{pid}.vcf"
    tmp_path = shard_path + ".part"
    with open(tmp_path, "w") as fh:
        for l in lines:
            fh.write(l + "\n")
    os.replace(tmp_path, shard_path)
    totals = allreduce_counters({"snv": n_snv, "indel": n_indel})
    return dict(shard=shard_path, num_snv_tests=totals["snv"],
                num_indel_tests=totals["indel"], n_local_vars=len(lines))


def run_call_distributed(args, extra) -> int:
    """CLI glue for `call-distributed`: multi-host region-parallel calling
    over the JAX distributed runtime.  Each process calls its assigned
    bins and writes a VCF shard; counters are all-reduced; process 0
    merges shards in genome order and applies the final global-Bonferroni
    filter (requires a shared filesystem for the shards, like the
    reference's parallel wrapper's tmp dir)."""
    import sys

    import jax

    from ..io.bam import BamReader
    from ..pipelines.parallel_call import finalize_parallel_output

    if args.region:
        print("FATAL: regions not allowed with call-distributed",
              file=sys.stderr)
        return 1
    from ..cli import confs_from_args

    initialize(args.coordinator, args.num_processes, args.process_id)
    vconf, pconf = confs_from_args(args)
    vconf_kw = {k: getattr(vconf, k) for k in vconf.__dataclass_fields__}
    pconf_kw = {k: getattr(pconf, k) for k in pconf.__dataclass_fields__
                if k != "bed"}
    prefix = str(args.out) + ".tmp"
    info = run_distributed_call(args.bam, args.ref, vconf_kw, pconf_kw,
                                prefix,
                                threads_per_host=args.threads_per_host)
    if jax.process_index() != 0:
        return 0

    lines = []
    for pid in range(jax.process_count()):
        shard = f"{prefix}.shard{pid}.vcf"
        with open(shard) as fh:
            lines.extend(l.rstrip("\n") for l in fh if l.strip())
        os.remove(shard)
    # shards interleave bins round-robin -> re-sort into genome order
    rdr = BamReader(args.bam)
    order = {name: i for i, (name, _l) in enumerate(rdr.header.references)}
    rdr.close()
    lines.sort(key=lambda l: (order.get(l.split("\t", 2)[0], 1 << 30),
                              int(l.split("\t", 2)[1])))
    return finalize_parallel_output(lines, info["num_snv_tests"],
                                    info["num_indel_tests"], args, vconf,
                                    tool="call-distributed")
