"""Config composition tests (hydra-parity contract)."""

import pytest


from mipheivit_tpu.config import Config, compose, save_config, load_yaml

pytestmark = pytest.mark.tier0


def test_default_compose():
    cfg = compose()
    assert cfg.model.model_name == "unet"
    assert cfg.train.batch_size == 16
    assert cfg.train.gan_train is True  # train=cell group sets it
    assert cfg.train.callbacks.modelcheckpoint.monitor == "val_cell_auc"
    assert cfg.data.targ_channel_names[0] == "Hoechst"
    assert len(cfg.data.targ_channel_names) == 16


def test_miphei_vit_preset():
    cfg = compose(["+default_configs=miphei-vit"])
    assert cfg.model.model_name == "myvitmatte"
    assert cfg.model.encoder.encoder_name == "hoptimus0"
    assert cfg.train.epochs == 15
    assert cfg.train.gan_train is False  # preset overrides cell default
    # cell train group (via `override /train: cell`) still applied:
    assert cfg.train.use_cell_metrics is True


def test_group_swap_and_value_overrides():
    cfg = compose(["data=hemit", "++train.epochs=99", "train.batch_size=4"])
    assert cfg.data.channel_stats_path == "channel_stats_hemit.json"
    assert cfg.data.targ_channel_names == ["Pan-CK", "CD3", "Dapi"]
    assert cfg.train.epochs == 99
    assert cfg.train.batch_size == 4


def test_experiment_sweep_file():
    cfg = compose(["+experiments/gan=partial_gan"])
    assert cfg.train.gan_train is True
    assert cfg.train.gan_mode == "structural"
    assert cfg.model.model_name == "unet_lora"


def test_roundtrip_save_load(tmp_path):
    cfg = compose(["+default_configs=miphei-vit", "++train.epochs=3"])
    path = tmp_path / "config.yaml"
    save_config(cfg, path)
    cfg2 = load_yaml(path)
    assert cfg2.to_dict() == cfg.to_dict()


def test_dotted_select_default():
    cfg = Config.create({"a": {"b": 1}})
    assert cfg.select("a.b") == 1
    assert cfg.select("a.c", 7) == 7
    cfg.set_dotted("x.y.z", [1, 2])
    assert cfg.x.y.z == [1, 2]


def test_multirun_glob_sweep():
    """-m +experiments/foundation_models='glob(*)' expands to every file in
    the group, each composed at _global_ (reference README.md:193-197)."""
    from mipheivit_tpu.config import compose_multirun

    jobs = compose_multirun(["+default_configs=miphei-vit",
                             "+experiments/foundation_models=glob(*)"])
    names = [n for n, _ in jobs]
    assert names == ["ctranspath", "hoptimus", "provgigapath", "univ2"]
    encoders = {c.model.encoder.encoder_name for _, c in jobs}
    assert len(encoders) == 4 and "hoptimus0" in encoders


def test_multirun_comma_and_product():
    from mipheivit_tpu.config import compose_multirun

    jobs = compose_multirun(["+default_configs=miphei-vit",
                             "++train.epochs=1,2",
                             "++train.batch_size=4,8"])
    assert len(jobs) == 4
    combos = {(c.train.epochs, c.train.batch_size) for _, c in jobs}
    assert combos == {(1, 4), (1, 8), (2, 4), (2, 8)}


def test_multirun_no_sweep_single_job():
    from mipheivit_tpu.config import compose_multirun

    jobs = compose_multirun(["+default_configs=miphei-vit"])
    assert len(jobs) == 1 and jobs[0][0] == "0"


def test_flagship_preset_adopts_measured_remat_winner():
    """The miphei-vit preset encodes the BASELINE.md remat-menu winner:
    remat_policy=fc1 at microbatch 8 x grad_accum 2 (the reference's
    effective batch 16 — reference configs/config.yaml:17-23), and
    get_generator plumbs model.remat_policy into the ViT config."""
    from mipheivit_tpu.config import compose
    from mipheivit_tpu.models import get_generator

    cfg = compose(["+default_configs=miphei-vit"])
    assert cfg.train.batch_size * cfg.train.grad_accum_steps == 16
    assert cfg.model.remat_policy == "fc1"

    model = get_generator("myvitmatte", 256, 3, 16, cfg)
    assert model.vit_cfg.remat_policy == "fc1"

    # an explicit override still wins
    cfg2 = compose(["+default_configs=miphei-vit",
                    "++model.remat_policy=full"])
    model2 = get_generator("myvitmatte", 256, 3, 16, cfg2)
    assert model2.vit_cfg.remat_policy == "full"
