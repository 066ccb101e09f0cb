"""Worker process for the two-process multi-host smoke test.

Run as ``python multihost_worker.py <pid> <nprocs> <port> <out.json>`` with
``JAX_PLATFORMS=cpu``: each process contributes its CPU device to the
global mesh via ``jax.distributed.initialize`` (the CPU analog of one TPU
host in a pod slice — SURVEY.md §5 distributed backend). It drives the
repo's real multi-host path: ``Loader.shard`` for disjoint per-host tiles
and ``device_prefetch``'s ``make_array_from_process_local_data`` global
batch assembly, then two optimizer steps on replicated state. The parent
test asserts the shards were disjoint and the state stayed bit-identical
across hosts.
"""

import json
import os
import sys


def main():
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]

    import jax

    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs

    import jax.numpy as jnp
    import numpy as np
    import optax

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from mipheivit_tpu.data.pipeline import Loader, device_prefetch
    from mipheivit_tpu.parallel import make_mesh, replicated

    class ToyDataset:
        def __len__(self):
            return 16

        def reset(self):
            pass

        def __getitem__(self, i, rng=None):
            return {"image": np.full((4, 4, 3), float(i), np.float32),
                    "idx": i}

    loader = Loader(ToyDataset(), batch_size=2, shuffle=False,
                    num_workers=1, drop_last=True).shard(pid, nprocs)
    mesh = make_mesh(n_data=jax.device_count())

    params = {"w": jnp.full((3, 1), 0.1, jnp.float32)}
    params = jax.device_put(params, replicated(mesh))
    opt = optax.sgd(0.05)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(p):
            pred = x.reshape(x.shape[0], -1, 3) @ p["w"]
            return jnp.mean((pred - 1.0) ** 2)

        _, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state

    seen, nsteps = [], 0
    for batch in device_prefetch(loader, mesh=mesh, size=2):
        seen.extend(int(v) for v in np.asarray(batch["idx"]))
        assert batch["image"].shape[0] == 2 * nprocs  # global batch
        params, opt_state = step(params, opt_state, batch["image"])
        nsteps += 1
        if nsteps == 2:
            break

    # checkpoint-export path on multi-host state: fetch_local must read
    # the full replicated value on EVERY host (plain np.asarray raises on
    # non-fully-addressable global arrays); the orbax snapshot is saved
    # from EVERY process (orbax barriers internally — a main-only call
    # deadlocks), then restored against the host template.
    from mipheivit_tpu.train.checkpoints import (
        fetch_local, restore_train_state, save_train_state)

    host_params = fetch_local(params)
    ckpt = save_train_state(params,
                            os.path.join(os.path.dirname(out_path),
                                         "mh_orbax"), step=nsteps)
    back = restore_train_state(ckpt, host_params)
    np.testing.assert_array_equal(back["w"], host_params["w"])

    w = np.asarray(host_params["w"])
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "seen": seen, "nsteps": nsteps,
                   "w": w.ravel().tolist()}, f)


if __name__ == "__main__":
    main()
