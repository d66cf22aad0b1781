"""Config system tests: shipped reference .conf files must load verbatim."""

import glob
import os

import pytest

from eavit_tpu.config import (
    Config,
    EnvType,
    RepresentationMethod,
    TrainMethod,
    ViTImplementation,
    config_from_args,
    get_args,
    load_config,
    print_config_options,
)

REF_CONFIGS = "/root/reference/configs"


def test_defaults_roundtrip():
    cfg = Config()
    assert cfg.batch_size == 128 * 64 // 32
    assert cfg.backbone_dim == cfg.vit.dim
    assert cfg.use_explorative_attn


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference absent")
def test_all_reference_confs_load():
    confs = glob.glob(os.path.join(REF_CONFIGS, "**", "*.conf"), recursive=True)
    assert confs, "no reference .conf files found"
    for path in confs:
        cfg = load_config(path)
        assert isinstance(cfg, Config), path


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference absent")
def test_flagship_conf_values():
    path = os.path.join(
        REF_CONFIGS,
        "expGlados3/Montezuma/config_originalRND_NoSSL_VitExplorativeAttnLucidrains.conf",
    )
    cfg = load_config(path)
    assert cfg.train_method == TrainMethod.ORIGINAL_RND
    assert cfg.representation_lr_method == RepresentationMethod.NONE
    assert cfg.env_type == EnvType.ATARI
    assert cfg.env_id == "MontezumaRevengeNoFrameskip-v4"
    assert cfg.epoch == 4 and cfg.mini_batch == 32
    assert cfg.learning_rate == 1e-4
    assert cfg.vit_implementation_type == ViTImplementation.LUCIDRAINS
    assert cfg.vit.dim == 256 and cfg.vit.depth == 3 and cfg.vit.heads == 8
    assert cfg.vit.patch_size == 6 and cfg.vit.dim_head == 32
    assert cfg.num_step == 128 and cfg.max_step_per_episode == 4500
    assert cfg.gamma == 0.999 and cfg.int_gamma == 0.99
    assert cfg.ext_coef == 2.0 and cfg.int_coef == 1.0
    assert cfg.update_proportion == 0.5  # honored here; reference ignores it
    assert cfg.use_gae and cfg.gae_lambda == 0.95
    assert cfg.pre_proc_height == 84 and cfg.obs_norm_step == 50
    assert not cfg.use_grad_clipping and cfg.max_grad_norm == 0.5
    assert cfg.ssl.barlow_twins_projection_sizes == (8192, 8192, 8192)


def test_debug_params_shrink():
    cfg = Config().with_debug_params()
    assert cfg.num_step == 16
    assert cfg.obs_norm_step == 5
    assert cfg.num_env_per_process == 4


def test_unknown_key_strict(tmp_path):
    p = tmp_path / "bad.conf"
    p.write_text("[DEFAULT]\nNotAKey = 1\n")
    with pytest.raises(KeyError):
        load_config(str(p))
    load_config(str(p), strict=False)  # non-strict ignores


def test_cli_parity():
    args = get_args(
        ["--train", "--num_env_per_process", "8", "--seed", "7", "--debug_params"]
    )
    cfg = config_from_args(args)
    assert cfg.seed == 7
    # debug_params overrides num_env_per_process (reference config.py:5-11)
    assert cfg.num_env_per_process == 4
    with pytest.raises(AssertionError):
        get_args(["--train", "--eval"])
    with pytest.raises(AssertionError):
        get_args([])


def test_cli_tolerates_unknown_flags():
    args = get_args(["--train", "--local-rank=0", "--some_launcher_flag", "x"])
    assert args.train


def test_print_config_options():
    text = print_config_options()
    assert "TrainMethod" in text and "UpdateProportion" in text


def test_new_round2_keys(tmp_path):
    conf = tmp_path / "t.conf"
    conf.write_text(
        "[DEFAULT]\nSyntheticMaze = True\nSSLEpochs = 7\nEvalEpisodes = 3\n"
    )
    cfg = load_config(str(conf))
    assert cfg.synthetic_maze is True
    assert cfg.ssl_pretrain_epochs == 7
    assert cfg.eval_episodes == 3


def test_cli_ssl_epochs_and_num_episodes():
    args = get_args(["--train", "--ssl_epochs", "5", "--num_episodes", "2"])
    cfg = config_from_args(args)
    assert cfg.ssl_pretrain_epochs == 5
    assert cfg.eval_episodes == 2
