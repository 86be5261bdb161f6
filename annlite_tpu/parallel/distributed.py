"""Multi-host (DCN) distribution: process bootstrap, hybrid meshes, and
hierarchical cross-host search merges.

The reference scales across machines only by running more Jina processes
behind a gateway (`annlite/executor.py:93-96`); here a multi-host TPU pod
slice is ONE logical device mesh: `jax.distributed.initialize` wires the
processes together, the mesh is laid out `('host', 'shard')` so that the
inner axis maps to ICI (fast chip interconnect within a host) and the outer
axis to DCN (data-center network between hosts), and every search merge is
hierarchical — per-shard top-k candidates are first merged over ICI, then
only the k winners per host cross DCN.  DCN traffic is O(hosts·Q·k)
regardless of corpus size or per-host chip count.

Launch recipe (one process per host):

    # host 0                                 # host 1
    python serve.py --coord host0:1234 \
        --nproc 2 --pid 0                    ... --pid 1

    # in serve.py, before any jax call:
    from annlite_tpu.parallel.distributed import init_distributed, make_hybrid_mesh
    init_distributed('host0:1234', num_processes=2, process_id=pid)
    mesh = make_hybrid_mesh()   # [n_hosts, devices_per_host]

CPU rehearsal (no TPU pod needed — 2 processes on one machine, gloo
collectives, 4 virtual devices each; this is what
`tests/test_distributed.py` runs):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python worker.py --pid {0,1}
"""
from typing import Optional, Sequence

import numpy as np

HOST_AXIS = 'host'
ICI_AXIS = 'shard'


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_collectives: str = 'gloo',
):
    """Bootstrap `jax.distributed` for a multi-host index.

    On TPU pods all arguments can be None (auto-detected from the TPU
    metadata server).  On CPU (rehearsal/testing) pass them explicitly and
    the gloo collectives backend is enabled so psum/all_gather cross
    process boundaries.  Idempotent: calling twice is a no-op."""
    import jax

    if getattr(init_distributed, '_done', False):
        return
    # NOTE: must not touch the backend before initialize() (so no
    # jax.default_backend() here) — the env var is the only safe signal
    if _platform_is_cpu():
        jax.config.update('jax_cpu_collectives_implementation', cpu_collectives)
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    jax.distributed.initialize(**kwargs)
    init_distributed._done = True


def _platform_is_cpu() -> bool:
    import os

    return os.environ.get('JAX_PLATFORMS', '').startswith('cpu')


def make_hybrid_mesh(mesh_shape: Optional[Sequence[int]] = None):
    """A 2-D `('host', 'shard')` mesh: outer axis over hosts (DCN), inner
    axis over each host's chips (ICI).

    With multiple processes the hybrid helper lays devices out so the inner
    axis stays inside each host's ICI domain; single-process (testing) it
    reshapes the local devices to the requested shape."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n_proc = jax.process_count()
    if mesh_shape is None:
        per_host = len(devices) // max(n_proc, 1)
        mesh_shape = (n_proc, per_host)
    if n_proc > 1:
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, mesh_shape[1]),
                dcn_mesh_shape=(mesh_shape[0], 1),
                devices=devices,
            )
        except ValueError:
            # CPU rehearsal: virtual devices carry no slice topology — group
            # rows by owning process so the outer axis is still "per host"
            ordered = sorted(devices, key=lambda d: (d.process_index, d.id))
            dev_array = np.asarray(ordered).reshape(mesh_shape)
    else:
        dev_array = np.asarray(devices[: mesh_shape[0] * mesh_shape[1]]).reshape(
            mesh_shape
        )
    return Mesh(dev_array, (HOST_AXIS, ICI_AXIS))


def put_sharded(mesh, x: np.ndarray, spec) -> 'jax.Array':
    """Place a host-replicated numpy array onto a (possibly multi-process)
    mesh: every process holds the full `x` and contributes only its
    addressable shards (`jax.make_array_from_callback`), so the same call
    works single-process and across hosts."""
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def shard_codes_2d(mesh, codes_t: np.ndarray):
    """Transposed PQ codes ``[M, N]`` with N split host-major over
    ``host × shard`` (pads N to a multiple of the device count)."""
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.devices.size
    m, n = codes_t.shape
    n_pad = -(-n // n_dev) * n_dev
    if n_pad != n:
        codes_t = np.pad(codes_t, ((0, 0), (0, n_pad - n)))
    return put_sharded(mesh, codes_t, P(None, (HOST_AXIS, ICI_AXIS)))


def shard_mask_2d(mesh, mask: np.ndarray, n_pad: int):
    from jax.sharding import PartitionSpec as P

    out = np.zeros(n_pad, dtype=np.int8)
    out[: len(mask)] = np.asarray(mask).astype(np.int8)
    return put_sharded(mesh, out, P((HOST_AXIS, ICI_AXIS)))


def replicate_2d(mesh, x: np.ndarray):
    from jax.sharding import PartitionSpec as P

    return put_sharded(mesh, np.asarray(x), P())


def sharded_adc_topk_2d(mesh, dtable, codes_t, mask, k: int):
    """Masked ADC search over a host×shard mesh with a HIERARCHICAL merge:
    per-device top-k → all_gather over ICI (`shard`) → per-host top-k →
    all_gather over DCN (`host`) → global top-k.  Only O(hosts·Q·k)
    crosses DCN; the O(P·Q·k) stage rides ICI.

    dtable ``[Q, M, K]`` replicated; codes_t ``[M, N]`` sharded host-major;
    mask ``[N]`` sharded alike.  Returns replicated
    ``(dists[Q, k], global_idx[Q, k])``."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..ops.adc import adc_scores

    def local(dt, ct, mk):
        scores = adc_scores(dt, ct, mk)
        kk = min(k, ct.shape[1])
        neg, idx = jax.lax.top_k(-scores, kk)
        local_n = ct.shape[1]
        # flattened device order of P(None, (host, shard)) is host-major
        pos = (
            jax.lax.axis_index(HOST_AXIS) * jax.lax.axis_size(ICI_AXIS)
            + jax.lax.axis_index(ICI_AXIS)
        )
        gidx = idx + pos * local_n
        # stage 1: merge the per-device candidates over ICI
        d_all = jax.lax.all_gather(-neg, ICI_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(gidx, ICI_AXIS, axis=1, tiled=True)
        neg2, p2 = jax.lax.top_k(-d_all, kk)
        d_h = -neg2
        i_h = jnp.take_along_axis(i_all, p2, axis=1)
        # stage 2: merge the per-host winners over DCN
        d_all = jax.lax.all_gather(d_h, HOST_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i_h, HOST_AXIS, axis=1, tiled=True)
        neg3, p3 = jax.lax.top_k(-d_all, kk)
        return -neg3, jnp.take_along_axis(i_all, p3, axis=1)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, (HOST_AXIS, ICI_AXIS)), P((HOST_AXIS, ICI_AXIS))),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(dtable, codes_t, mask)


def sharded_lloyd_step_2d(mesh, x_sharded, centroids):
    """Data-parallel Lloyd step over a host×shard mesh — centroid statistics
    psum over BOTH axes (XLA routes the ICI part first)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    def local(x, c):
        dots = jnp.dot(x, c.T, preferred_element_type=jnp.float32)
        d2 = (
            jnp.sum(x * x, axis=1)[:, None]
            + jnp.sum(c * c, axis=1)[None, :]
            - 2 * dots
        )
        labels = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(labels, c.shape[0], dtype=jnp.float32)
        axes = (HOST_AXIS, ICI_AXIS)
        sums = jax.lax.psum(
            jnp.dot(onehot.T, x, preferred_element_type=jnp.float32), axes
        )
        counts = jax.lax.psum(jnp.sum(onehot, axis=0), axes)
        new_c = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), c
        )
        inertia = jax.lax.psum(jnp.sum(jnp.min(d2, axis=1)), axes)
        return new_c, inertia

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P((HOST_AXIS, ICI_AXIS), None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(x_sharded, centroids)
