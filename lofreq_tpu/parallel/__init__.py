"""Distributed execution: device meshes, multi-host region scheduling.

Single-host parallelism lives in pipelines/parallel_call.py (process pool
over greedy-bisection region bins, like the reference's wrapper).  This
package adds the JAX-distributed layer: mesh construction, multi-host
initialization, and the cross-host variant of the region scheduler.
"""
