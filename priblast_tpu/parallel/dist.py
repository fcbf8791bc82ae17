"""Multi-chip scaling via jax.sharding meshes.

The reference distributes work with MPI (Scatterv index lists, an RMA
work-stealing counter, gather-to-one-rank index builds and token-ring file
merges — SURVEY §2/L4). The TPU-native replacement:

- queries/db sequences are partitioned on the host by deterministic LPT
  (priblast_tpu.utils.fasta.partition_lpt) — same balancing intent as the
  reference's heap/area strategies, but static, so SPMD steps stay in
  lockstep;
- the accessibility engine runs data-parallel over a 1-D device mesh: the
  batch dimension is sharded, every device executes the identical scan
  program on its shard (no cross-device dependencies inside the DP — base
  pairs never span sequences);
- per-shard hit statistics are merged with ICI collectives (psum /
  all_gather) instead of MPI reductions; ordered output assembly happens
  once on the host, which already owns the results in submission order
  (replacing the reference's completion-order ring,
  src/rna_interaction_search.cpp:202-230).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from priblast_tpu.utils import jaxcache

jaxcache.enable()  # persistent XLA compile cache for every kernel module



def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def maybe_mesh() -> Mesh | None:
    """A 1-D data mesh over this process's LOCAL devices, or None when
    single-device. Local (not global) on purpose: under jax.distributed
    each process owns its query/db partition outright (the reference's
    per-rank distribution), so its device work must not form global
    arrays — a global mesh would require every process to hold identical
    values (tests/test_multihost.py::test_multiprocess_ris_tpu_engine)."""
    devs = jax.local_devices()
    return Mesh(np.array(devs), ("data",)) if len(devs) > 1 else None


def put_batch(x, mesh: Mesh | None):
    """Commit a [B, ...] array to the mesh, batch dimension sharded. With a
    committed input sharding, jit compiles the downstream kernel SPMD over
    the mesh — the TPU-native analog of the reference's per-rank sequence
    distribution (src/fastafile_reader.cpp:135-314)."""
    if mesh is None:
        return jnp.asarray(x)
    ndev = int(np.prod(mesh.devices.shape))
    if np.shape(x)[0] % ndev:
        # batch smaller than (or not divisible by) the mesh: replicate —
        # a tiny batch is not worth sharding, and device_put would reject
        # a non-divisible leading dim (hit by multiprocess runs whose
        # global mesh exceeds the padded batch, tests/test_multihost.py)
        return jax.device_put(x, NamedSharding(mesh, P()))
    spec = P("data", *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def put_replicated(x, mesh: Mesh | None):
    """Commit a lookup buffer replicated across the mesh (db pages and
    query packs are read-only gather sources for every shard)."""
    if mesh is None:
        return jnp.asarray(x)
    return jax.device_put(x, NamedSharding(mesh, P()))


def sharded_accessibility_step(mesh: Mesh, w_span: int, min_acc_len: int,
                               n_max: int, dtype: str = "float32"):
    """Build the jitted data-parallel accessibility step: input codes
    [B, n_max + pad] sharded over 'data', outputs sharded the same way,
    plus a psum'd scalar summary that exercises an ICI collective."""
    from priblast_tpu.accessibility.batched import _run_batch_impl

    in_sh = NamedSharding(mesh, P("data", None))
    len_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    @functools.partial(jax.jit,
                       in_shardings=(in_sh, len_sh),
                       out_shardings=(in_sh, in_sh, rep))
    def step(s_padded, lengths):
        acc, cond = _run_batch_impl(w_span, min_acc_len, n_max, dtype,
                                    False, s_padded, lengths)
        # cross-shard merge: global mean accessibility (rides ICI)
        total = jnp.sum(acc) / jnp.maximum(jnp.sum(lengths), 1)
        return acc, cond, total

    return step


def run_sharded(step, codes: np.ndarray, lengths: np.ndarray):
    from priblast_tpu.utils import thermo

    B, n_max = codes.shape
    s = np.zeros((B, n_max + thermo.MAXLOOP + 4), dtype=np.int32)
    s[:, 1 : n_max + 1] = codes
    return step(jnp.asarray(s), jnp.asarray(lengths, dtype=jnp.int32))
