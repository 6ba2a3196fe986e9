"""Device-mesh parallelism: seed-axis ensembles and agent-axis sharding."""

from .mesh import make_mesh, shard_run  # noqa: F401
