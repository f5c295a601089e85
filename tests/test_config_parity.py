"""The reference's committed YAML configs must load through our config
system (eval()-string CNN params, 'Nono' decode type, etc.)."""

import pytest

from mdd_tpu.utils.config import load_config


def test_reference_attention_configs_load(reference_dir):
    for name in ("ctc_config.yaml", "ctc_config.0329.yaml"):
        path = reference_dir / "egs" / "attention_aug" / "conf" / name
        if not path.exists():
            pytest.skip(f"{name} missing")
        cfg = load_config(str(path))
        assert cfg.rnn_hidden_size == 384
        assert cfg.rnn_layers == 4
        # python-literal strings parsed without eval()
        assert tuple(map(tuple, cfg.stride)) == ((1, 2), (2, 2))
        assert tuple(map(tuple, cfg.channel)) == ((1, 32), (32, 32))
        assert cfg.decode_type == "Nono"   # quirk: != Greedy -> beam
        mc = cfg.model_config(num_class=43)
        assert mc.conv_strides == ((1, 2), (2, 2))
        assert mc.input_dim == 243
        assert mc.time_downsample == 2


def test_reference_baseline_config_loads(reference_dir):
    path = (reference_dir / "egs" / "cnn-rnn-ctc" / "conf"
            / "ctc_config.yaml")
    if not path.exists():
        pytest.skip("baseline config missing")
    cfg = load_config(str(path))
    assert cfg.decode_type == "Beam"
    assert cfg.batch_size == 64
