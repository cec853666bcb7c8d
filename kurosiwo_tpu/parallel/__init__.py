"""Mesh-first parallel runtime. The reference is single-GPU (SURVEY.md §2.10);
here every step is pjit-compiled over a named mesh and single-chip is simply a
1x1 mesh."""

from .mesh import MeshPlan, create_mesh, batch_sharding, replicated, shard_batch
