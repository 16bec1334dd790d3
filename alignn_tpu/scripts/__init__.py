"""Campaign scripts (reference L7: `alignn/scripts/`, ~34 launchers).

High-throughput helpers: per-dataset/per-property training launchers and
bulk prediction — re-imagined for TPU scheduling (one process per job,
generated shell scripts) instead of the reference's jarvis SLURM queue.
"""
