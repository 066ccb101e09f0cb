"""Config composition tests (hydra-parity contract)."""

import pytest

from mipheivit_tpu.config import Config, compose, save_config, load_yaml


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
