"""Drive `cli train --distributed` across two real OS processes.

tools/distributed_smoke.py exercises the library surface; this test
executes the actual CLI entry (cmd_train with --distributed, whose
`jax.distributed.initialize()` discovers the coordinator from the
standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
env vars) end-to-end on a tiny on-disk corpus with the device-cache
input path (the supported multi-process loader), and pins the logged
losses across ranks and against a single-process run of the same
config.

The subprocess bootstraps through `jax.config.update("jax_platforms",
"cpu")` before calling main() — the axon TPU plugin in this image hangs
when initialized from spawned subprocesses and ignores the env var —
but everything from argparse onward is the shipped CLI code.
"""

import os
import re
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

BOOT = ("import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
        "from mdd_tpu.cli import main; sys.exit(main(sys.argv[1:]))")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from mdd_tpu.frontend import kaldi_io

    d = tmp_path_factory.mktemp("dist_cli")
    rng = np.random.default_rng(0)
    with kaldi_io.ArkScpWriter(str(d / "f.ark"), str(d / "f.scp")) as w, \
            open(d / "lab", "w") as lab, open(d / "trn", "w") as trn:
        for i in range(12):
            t = int(rng.integers(24, 64))
            w.write(f"u{i}", rng.standard_normal((t, 81)).astype(np.float32))
            lab.write(f"u{i} aa b k\n")
            trn.write(f"u{i} aa b k\n")
    (d / "units").write_text("sil\naa\nb\nk\n")
    return d


def _conf(corpus: Path, name: str, batch_size: int = 4) -> Path:
    conf = corpus / f"{name}.yaml"
    conf.write_text(textwrap.dedent(f"""\
        exp_name: {name}
        checkpoint_dir: ''
        vocab_file: {corpus}/units
        train_scp_path: {corpus}/f.scp
        train_lab_path: {corpus}/lab
        train_trans_path: {corpus}/trn
        valid_scp_path: {corpus}/f.scp
        valid_lab_path: {corpus}/lab
        valid_trans_path: {corpus}/trn
        test_scp_path: {corpus}/f.scp
        test_lab_path: {corpus}/lab
        test_trans_path: {corpus}/trn
        rnn_hidden_size: 16
        rnn_layers: 1
        batch_size: {batch_size}
        num_epoches: 1
        verbose_step: 50
        max_adjust_times: 1
        num_workers: 0
        device_frontend: true
        wire_dtype: bfloat16
        device_cache: true
        shuffle_train: false
    """))
    return conf


def _run_cli(conf: Path, n_proc: int, local_devices: int):
    """Spawn `cli train [--distributed]` per rank; -> list of stdouts."""
    port = _free_port()
    procs = []
    for pid in range(n_proc):
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                            f"{local_devices}")
        args = [sys.executable, "-c", BOOT, "train", "--conf", str(conf)]
        if n_proc > 1:
            env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
            env["JAX_NUM_PROCESSES"] = str(n_proc)
            env["JAX_PROCESS_ID"] = str(pid)
            args.append("--distributed")
        procs.append(subprocess.Popen(
            args, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        text = stdout.decode(errors="replace")
        assert p.returncode == 0, f"cli train failed:\n{text[-3000:]}"
        outs.append(text)
    return outs


def _losses(text: str):
    return [float(m) for m in re.findall(
        r"(?:Train|Valid) done, total_loss: ([\d.]+)", text)]


def test_cli_train_distributed_matches_single(corpus):
    # batch_size is per-host: 2 hosts x 4 rows == one host x 8 rows
    single = _run_cli(_conf(corpus, "single", batch_size=8), 1, 2)[0]
    want = _losses(single)
    assert len(want) == 2   # one train + one valid epoch

    outs = _run_cli(_conf(corpus, "dist"), 2, 1)
    assert all("distributed: process" in o for o in outs)
    got0, got1 = _losses(outs[0]), _losses(outs[1])
    # both ranks log identical (replicated, in-graph global) losses,
    # equal to the single-process run over the same global batches
    np.testing.assert_allclose(got0, got1, rtol=0, atol=0)
    np.testing.assert_allclose(got0, want, rtol=1e-4)


def test_cli_evaluate_distributed_matches_single(corpus):
    """`evaluate --distributed` across two real processes: each rank
    decodes its own shard (per-host EvalSession mesh), the tallies cross
    via all_reduce_report, and the global report equals the
    single-process evaluation."""
    conf = _conf(corpus, "eval", batch_size=4)
    # train once (single process) to produce the checkpoint
    ckpt_conf = corpus / "eval_ckpt.yaml"
    ckpt_conf.write_text(conf.read_text().replace(
        "checkpoint_dir: ''", f"checkpoint_dir: {corpus}/ckpt"))

    def run(args_extra, n_proc, local_devices, distributed=False):
        port = _free_port()
        procs = []
        for pid in range(n_proc):
            env = {k: v for k, v in os.environ.items()
                   if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                                f"{local_devices}")
            args = [sys.executable, "-c", BOOT] + args_extra
            if distributed:
                env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
                env["JAX_NUM_PROCESSES"] = str(n_proc)
                env["JAX_PROCESS_ID"] = str(pid)
                args.append("--distributed")
            procs.append(subprocess.Popen(
                args, cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        outs = []
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            text = stdout.decode(errors="replace")
            assert p.returncode == 0, f"failed:\n{text[-3000:]}"
            outs.append(text)
        return outs

    run(["train", "--conf", str(ckpt_conf)], 1, 2)
    single = run(["evaluate", "--conf", str(ckpt_conf)], 1, 2)[0]

    outs = run(["evaluate", "--conf", str(ckpt_conf)], 2, 1,
               distributed=True)

    def metrics(text):
        return re.findall(
            r"(total_error: \d+|total_phoneme: \d+|TA :  \d+|FR :  \d+"
            r"|FA :  \d+|TR :  \d+)", text)

    want = metrics(single)
    assert want, single[-2000:]
    for o in outs:
        assert "distributed: process" in o
        assert metrics(o) == want, (metrics(o), want)


def _conf_streaming(corpus: Path, name: str, batch_size: int,
                    force_global: bool) -> Path:
    conf = corpus / f"{name}.yaml"
    conf.write_text(textwrap.dedent(f"""\
        exp_name: {name}
        checkpoint_dir: ''
        vocab_file: {corpus}/units
        train_scp_path: {corpus}/f.scp
        train_lab_path: {corpus}/lab
        train_trans_path: {corpus}/trn
        valid_scp_path: {corpus}/f.scp
        valid_lab_path: {corpus}/lab
        valid_trans_path: {corpus}/trn
        test_scp_path: {corpus}/f.scp
        test_lab_path: {corpus}/lab
        test_trans_path: {corpus}/trn
        rnn_hidden_size: 16
        rnn_layers: 1
        batch_size: {batch_size}
        num_epoches: 1
        verbose_step: 50
        max_adjust_times: 1
        num_workers: 0
        shuffle_train: false
        global_schedule: {str(force_global).lower()}
    """))
    return conf


def test_cli_train_distributed_streaming_loader(corpus):
    """The STREAMING loader's global batch schedule across two real
    processes: no device cache, features loaded per host slice, shapes
    coordinated via the header-scanned lengths — losses equal the
    single-process run of the same global schedule."""
    single = _run_cli(
        _conf_streaming(corpus, "stream_single", 8, force_global=True),
        1, 2)[0]
    want = _losses(single)
    assert len(want) == 2

    outs = _run_cli(
        _conf_streaming(corpus, "stream_dist", 4, force_global=False),
        2, 1)
    got0, got1 = _losses(outs[0]), _losses(outs[1])
    np.testing.assert_allclose(got0, got1, rtol=0, atol=0)
    np.testing.assert_allclose(got0, want, rtol=1e-4)
