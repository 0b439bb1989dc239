"""Worker for the REAL multi-process distributed test (not collected by
pytest — launched as ``python tests/_mp_worker.py <pid> <nprocs> <port>
<workdir>`` by ``test_distributed.py::test_two_process_distributed_run``).

Each process owns 4 virtual CPU devices; together they form the 8-device
global mesh. This exercises the actual multi-process code paths that a
TPU pod uses (the rebuild of the reference's ``mp.spawn`` +
``init_process_group("nccl")`` world, ``/root/reference/main.py:42-47``):

- ``maybe_initialize_distributed`` rendezvous (explicit coordinator),
- host object collectives (``all_gather_objects`` / ``broadcast_object`` /
  ``shared_random_seed``),
- striped ``DataLoader`` feeding ONE global sharded array per batch
  (``make_global_array``), a jitted train step over the global mesh,
- ``run_eval_loop`` cross-process reduction,
- ``produce_evaluation_file`` stripe merge → process 0 writes the same
  score file a single-process run writes.

Results land in ``<workdir>/report_<pid>.json`` for the test to assert.
"""

import json
import os
import sys


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    workdir = sys.argv[4]

    import jax

    from rtdsd_tpu.parallel.distributed import (all_gather_objects,
                                                broadcast_object,
                                                maybe_initialize_distributed,
                                                shared_random_seed)

    active = maybe_initialize_distributed(
        coordinator=f"localhost:{port}", num_processes=nprocs, process_id=pid)
    assert active, "maybe_initialize_distributed returned False"
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 4 * nprocs, jax.devices()

    import numpy as np

    report = {"process_count": jax.process_count(),
              "global_devices": len(jax.devices())}

    # ---- host object collectives --------------------------------------
    gathered = all_gather_objects({"pid": pid, "arr": np.arange(3) + pid})
    assert len(gathered) == nprocs
    report["gathered_pids"] = [int(g["pid"]) for g in gathered]
    report["gathered_arr_ok"] = all(
        np.array_equal(g["arr"], np.arange(3) + g["pid"]) for g in gathered)
    report["broadcast"] = int(broadcast_object(np.asarray(4242 + pid)))
    report["shared_seed"] = shared_random_seed()

    # ---- sharded train steps over the global mesh ---------------------
    import jax.numpy as jnp
    import optax

    from rtdsd_tpu.data.dataset import AudioDataset, Trial
    from rtdsd_tpu.data.loader import DataLoader, device_prefetch
    from rtdsd_tpu.engine.steps import (create_train_state, make_eval_step,
                                        make_train_step)
    from rtdsd_tpu.engine.trainer import run_eval_loop
    from rtdsd_tpu.models.wav2vec2 import Wav2Vec2Config
    from rtdsd_tpu.models.zoo import XLSR_AASIST
    from rtdsd_tpu.parallel.mesh import batch_sharding, make_mesh

    tiny = Wav2Vec2Config(
        conv_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
        encoder_embed_dim=16, encoder_ffn_dim=32, encoder_heads=2,
        encoder_layers=2, conv_pos=8, conv_pos_groups=2)
    model = XLSR_AASIST(w2v_cfg=tiny, dtype=jnp.float32)
    sample = jnp.zeros((2, 4000), jnp.float32)
    tx = optax.sgd(1e-3)
    # same seed on every process -> identical initial params, as on a pod
    state = create_train_state(model, jax.random.key(0), sample, tx)

    mesh = make_mesh(data=len(jax.devices()))
    bsh = batch_sharding(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))
    state0 = state  # untrained copy: the score-file comparison vs the
    # single-process run needs bit-identical params (training order is
    # permutation-sensitive through fp reassociation; scoring is per-row)

    with open(os.path.join(workdir, "protocol.txt")) as fh:
        rows = [ln.split() for ln in fh.read().strip().splitlines()]
    trials = [Trial(utt_id=u, path=os.path.join(workdir, "audio", u + ".wav"),
                    label=1 if lab == "bonafide" else 0)
              for u, lab in rows]
    dataset = AudioDataset(trials, duration=4000, is_random_start=False)

    mk_loader = lambda: DataLoader(
        dataset, batch_size=4, shuffle=False, drop_last=False,
        num_workers=1, process_index=jax.process_index(),
        process_count=jax.process_count(), pad_last=True)

    from rtdsd_tpu.parallel.distributed import barrier

    step = make_train_step(model, tx, preemph=0.97, donate=False)
    losses = []
    key = jax.random.key(7)
    compiled = None
    for b in device_prefetch(mk_loader(), size=2, sharding=bsh):
        assert b.waves.shape[0] == 4 * nprocs  # global batch
        if compiled is None:
            # compile apart, execute together: the grad all-reduce's Gloo
            # context init has a ~30 s peer budget a cold compile can miss
            compiled = step.lower(state, b.waves, b.labels, key).compile()
            barrier()
        state, metrics = compiled(state, b.waves, b.labels, key)
        losses.append(float(metrics["loss"]))
    report["train_losses"] = losses

    # ---- eval loop with cross-process reduction -----------------------
    ev = make_eval_step(model, preemph=0.97)
    eval_loss, acc, scores, labels = run_eval_loop(
        ev, state, mk_loader(), prefetch=2, batch_sharding=bsh)
    report["eval_loss"] = float(eval_loss)
    report["eval_acc"] = float(acc)
    report["eval_rows"] = int(len(scores))

    # ---- score-file production (stripe merge, process 0 writes) -------
    from rtdsd_tpu.cli.common import produce_evaluation_file
    from rtdsd_tpu.models.registry import ModelSpec

    spec = ModelSpec(name="tiny", module=model, freeze_patterns=(),
                     unfreeze_patterns=(), reinit_patterns=(),
                     layer_indices=None)
    produce_evaluation_file(
        dataset, spec, state0, os.path.join(workdir, "scores_mp.txt"),
        batch_size=4, sharding=bsh, num_workers=1)

    # cascade path: screener stripes merge globally BEFORE the subset is
    # built (a per-stripe subset would desynchronize the collectives);
    # band=1e9 escalates everything and screener == full model, so the
    # merged cascade file must equal the plain one
    from rtdsd_tpu.cli.common import produce_evaluation_file_cascade

    produce_evaluation_file_cascade(
        dataset, dataset, spec, state0, spec, state0,
        os.path.join(workdir, "scores_mp_cascade.txt"),
        batch_size=4, band=1e9, sharding=bsh, num_workers=1)

    with open(os.path.join(workdir, f"report_{pid}.json"), "w") as fh:
        json.dump(report, fh)
    print(f"worker {pid}: OK")


if __name__ == "__main__":
    main()
