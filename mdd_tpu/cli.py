"""Command-line interface: the run.sh pipeline as subcommands.

Replaces the reference's stage-gated shell driver
(egs/attention_aug/run.sh:23-64) and scattered entry scripts with one
CLI:

  python -m mdd_tpu prepare-timit    --timit-dir D --out DIR
  python -m mdd_tpu prepare-l2arctic --l2-dir D --out-root DIR
  python -m mdd_tpu merge            --dirs A B --out DIR
  python -m mdd_tpu units            --phn-text F --out UNITS
  python -m mdd_tpu feat             --wav-scp F --out-dir DIR [--cmvn F]
                                   [--feat-type {fbank,mfcc,spectrogram}]
  python -m mdd_tpu train-lm         --phn-text F --out ARPA
  python -m mdd_tpu train            --conf YAML
  python -m mdd_tpu evaluate         --conf YAML [--dump-dir DIR]
  python -m mdd_tpu infer            --wav-transcript-path DIR --conf YAML
  python -m mdd_tpu serve            --conf YAML --cmvn F   (JSON on stdin)
  python -m mdd_tpu mdd-result       --ref F --human F --hyp F
  python -m mdd_tpu benchmark
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def _model_config_from_meta(meta: dict):
    from mdd_tpu.models.ctc_model import ModelConfig

    raw = dict(meta["model_config"])
    for k in ("conv_channels", "conv_kernels", "conv_strides",
              "conv_padding"):
        if k in raw:
            v = raw[k]
            raw[k] = tuple(tuple(e) if isinstance(e, list) else e for e in v)
    return ModelConfig(**raw)


def _distributed_initialize() -> None:
    """Multi-host init: every host runs the same command.

    Coordinator/rank discovery comes from the runtime's cluster
    environment (TPU pod metadata, Slurm, OpenMPI, K8s — jax's built-in
    auto-detection), or explicitly from JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES + JAX_PROCESS_ID when set (generic launchers;
    exercised for real by tests/test_distributed_cli.py).
    """
    import os

    import jax

    if os.environ.get("JAX_NUM_PROCESSES"):
        missing = [v for v in ("JAX_COORDINATOR_ADDRESS", "JAX_PROCESS_ID")
                   if not os.environ.get(v)]
        if missing:
            raise SystemExit(
                "JAX_NUM_PROCESSES is set but %s %s missing — explicit "
                "multi-process setup needs JAX_COORDINATOR_ADDRESS, "
                "JAX_NUM_PROCESSES and JAX_PROCESS_ID together"
                % (" and ".join(missing),
                   "is" if len(missing) == 1 else "are"))
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    else:
        jax.distributed.initialize()


def _build_loader(cfg, vocab, scp, lab, trans, train: bool,
                  device_fe: bool = False, mesh=None,
                  allow_cache: bool = True):
    import jax

    from mdd_tpu.data.dataset import BucketedLoader, SpeechDataset
    from mdd_tpu.data.prefetch import ThreadedLoader

    ds = SpeechDataset(
        vocab, scp, lab, trans,
        left_ctx=cfg.left_ctx, right_ctx=cfg.right_ctx,
        n_skip_frame=cfg.n_skip_frame, n_downsample=cfg.n_downsample,
        train=train, augment_mode=cfg.augment_mode,
        mutation_prob=cfg.mutation_prob,
        device_frontend=device_fe)
    if device_fe and allow_cache and getattr(cfg, "device_cache", False):
        # steady-state input path: corpus pinned in HBM, per-epoch batches
        # are on-device gathers (data.device_cache) — no feature bytes on
        # the wire after the one-time upload
        from mdd_tpu.data.device_cache import CachedLoader, DeviceFeatureCache

        # same wire-dtype default as the streaming branch below (unset ->
        # float32): the cached and streaming paths must produce identical
        # features for one config, or PER/F1 would silently differ
        # between device_cache modes / process counts
        cache = DeviceFeatureCache(
            ds, mesh=mesh, time_quantum=cfg.time_quantum,
            wire_dtype=cfg.wire_dtype or "float32",
            num_workers=max(cfg.num_workers, 1))
        return CachedLoader(cache, cfg.batch_size,
                            shuffle=train and cfg.shuffle_train,
                            seed=cfg.seed, label_quantum=cfg.label_quantum,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())
    loader = BucketedLoader(ds, cfg.batch_size,
                            shuffle=train and cfg.shuffle_train,
                            seed=cfg.seed, num_workers=cfg.num_workers,
                            time_quantum=cfg.time_quantum,
                            label_quantum=cfg.label_quantum,
                            process_index=jax.process_index(),
                            process_count=jax.process_count(),
                            wire_dtype=(cfg.wire_dtype or None)
                            if device_fe else None,
                            global_schedule=(True if getattr(
                                cfg, "global_schedule", False) else None))
    if cfg.num_workers > 0:
        loader = ThreadedLoader(loader, prefetch=4)
    return loader


def cmd_prepare_timit(args) -> int:
    from mdd_tpu.data.prepare import prepare_timit

    speakers = None
    if args.speakers_file:
        speakers = [l.strip() for l in open(args.speakers_file)
                    if l.strip()]
    n = prepare_timit(args.timit_dir, args.out, speakers=speakers,
                      phoneme_map=args.phoneme_map)
    print(f"prepared {n} TIMIT utterances -> {args.out}")
    return 0


def cmd_prepare_l2arctic(args) -> int:
    from mdd_tpu.data.prepare import prepare_l2arctic

    for split in ("train", "dev", "test"):
        out = f"{args.out_root}/l2_{split}"
        n = prepare_l2arctic(args.l2_dir, out, split,
                             keep_reduced=not args.fold_reduced)
        print(f"prepared {n} L2-ARCTIC {split} utterances -> {out}")
    return 0


def cmd_merge(args) -> int:
    from mdd_tpu.data.prepare import merge_data_dirs

    merge_data_dirs(args.dirs, args.out)
    print(f"merged {len(args.dirs)} dirs -> {args.out}")
    return 0


def cmd_units(args) -> int:
    from mdd_tpu.data.prepare import build_units

    units = build_units(args.phn_text, args.out)
    print(f"{len(units)} units -> {args.out}")
    return 0


def cmd_feat(args) -> int:
    from mdd_tpu.frontend.cmvn import parse_kaldi_cmvn_text
    from mdd_tpu.frontend.pipeline import extract_split

    feat_type = getattr(args, "feat_type", "fbank")
    if feat_type == "spectrogram":
        # legacy path parity (local/make_spectrum.py): plain ark/scp of
        # log-spectrograms, no CMVN stage.
        if args.cmvn:
            raise SystemExit(
                "--cmvn is not supported with --feat-type spectrogram: "
                "the legacy spectrogram path (local/make_spectrum.py) "
                "has no CMVN stage — the stats would be silently "
                "ignored.  Use fbank or mfcc for CMVN-normalized "
                "features.")
        from pathlib import Path

        from mdd_tpu.frontend.spectrogram import make_spectrum

        out = Path(args.out_dir)
        out.mkdir(parents=True, exist_ok=True)
        name = args.name if args.name != "fbank" else "spectrogram"
        scp_path = str(out / f"{name}.scp")
        make_spectrum(args.wav_scp, str(out / f"{name}.ark"), scp_path)
        print(f"features -> {scp_path}")
        return 0
    if feat_type == "mfcc":
        from mdd_tpu.frontend.mfcc import MfccConfig

        cfg = MfccConfig()
        name = args.name if args.name != "fbank" else "mfcc"
    else:
        from mdd_tpu.frontend.fbank import FbankConfig

        cfg = FbankConfig()
        name = args.name
    cmvn = parse_kaldi_cmvn_text(args.cmvn) if args.cmvn else None
    scp_path, _ = extract_split(args.wav_scp, args.out_dir,
                                name=name, cfg=cfg, cmvn=cmvn,
                                batch_size=args.batch_size)
    print(f"features -> {scp_path}")
    return 0


def cmd_train_lm(args) -> int:
    from mdd_tpu.decode.lm_train import train_phone_lm

    n = train_phone_lm(args.phn_text, args.out)
    print(f"trained bigram LM on {n} sentences -> {args.out}")
    return 0


def cmd_train(args) -> int:
    import jax

    from mdd_tpu.data.vocab import Vocab
    from mdd_tpu.train.loop import Trainer
    from mdd_tpu.utils.config import load_config

    if args.distributed:
        _distributed_initialize()
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    cfg = load_config(args.conf)
    vocab = Vocab.from_units_file(cfg.vocab_file)
    print(f"Vocabulary size is {vocab.n_words}")
    # the device-frontend wire format is a Trainer-level contract: the
    # train AND dev loaders must both use it (both feed Trainer steps);
    # the eval session (cmd_evaluate) stays host-spliced.
    device_fe = bool(getattr(cfg, "device_frontend", False))
    trainer = Trainer(
        cfg.model_config(vocab.n_words),
        init_lr=cfg.init_lr, weight_decay=cfg.weight_decay,
        lr_decay=cfg.lr_decay, end_adjust_acc=cfg.end_adjust_acc,
        plateau_patience=cfg.plateau_patience,
        max_adjust_times=cfg.max_adjust_times, seed=cfg.seed,
        n_devices=cfg.data_parallel,
        device_frontend=device_fe,
        left_ctx=cfg.left_ctx, right_ctx=cfg.right_ctx,
        n_skip_frame=cfg.n_skip_frame, n_downsample=cfg.n_downsample)
    train_loader = _build_loader(cfg, vocab, cfg.train_scp_path,
                                 cfg.train_lab_path, cfg.train_trans_path,
                                 train=True, device_fe=device_fe,
                                 mesh=trainer.mesh)
    dev_loader = _build_loader(cfg, vocab, cfg.valid_scp_path,
                               cfg.valid_lab_path, cfg.valid_trans_path,
                               train=False, device_fe=device_fe,
                               mesh=trainer.mesh)
    if args.profile_dir:
        # device trace of the whole run (compiles + steps); the profile
        # covers what the tracing row of SURVEY.md §5 asks for beyond
        # the reference's wall-clock prints
        jax.profiler.start_trace(args.profile_dir)
    try:
        summary = trainer.fit(train_loader, dev_loader,
                              num_epochs=cfg.num_epoches,
                              print_every=cfg.verbose_step,
                              checkpoint_dir=cfg.checkpoint_dir,
                              exp_name=cfg.exp_name,
                              resume=args.resume,
                              checkpoint_every=cfg.checkpoint_every)
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
    print("best dev loss %.4f acc %.4f after %d epochs"
          % (summary["best_dev_loss"], summary["best_acc"],
             summary["epochs"]))
    return 0


def _load_eval_session(cfg, checkpoint: Optional[str] = None,
                       device_frontend: bool = False):
    import os

    from mdd_tpu.data.vocab import Vocab
    from mdd_tpu.evals.evaluate import EvalSession
    from mdd_tpu.train.checkpoint import load_checkpoint

    vocab = Vocab.from_units_file(cfg.vocab_file)
    ckpt_dir = checkpoint or os.path.join(cfg.checkpoint_dir, cfg.exp_name)
    state, meta = load_checkpoint(ckpt_dir, "best")
    model_cfg = _model_config_from_meta(meta)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    session = EvalSession(model_cfg, variables, vocab,
                          decode_type=cfg.decode_type,
                          beam_width=cfg.beam_width,
                          lm_path=cfg.lm_path or None,
                          lm_alpha=cfg.lm_alpha,
                          device_frontend=device_frontend,
                          left_ctx=cfg.left_ctx, right_ctx=cfg.right_ctx,
                          n_skip_frame=cfg.n_skip_frame,
                          n_downsample=cfg.n_downsample)
    return session, vocab, model_cfg


def cmd_evaluate(args) -> int:
    from mdd_tpu.evals.evaluate import evaluate_model
    from mdd_tpu.utils.config import load_config

    if getattr(args, "distributed", False):
        import jax

        _distributed_initialize()
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}")
    cfg = load_config(args.conf)
    if getattr(args, "decode_type", None):
        cfg.decode_type = args.decode_type
    if getattr(args, "lm_alpha", None) is not None:
        cfg.lm_alpha = args.lm_alpha
    # device-frontend eval: raw bf16 features on the wire, splice/skip
    # inside the jit forward — same fast path as training; the dominant
    # whole-corpus eval cost on a remote-attached chip is otherwise the
    # spliced-float32 host->device transfer
    device_fe = bool(getattr(cfg, "device_frontend", False))
    session, vocab, _ = _load_eval_session(cfg, args.checkpoint,
                                           device_frontend=device_fe)
    # `evaluate --cached`: transfer-free cached eval (the test set pins
    # in HBM like the training corpus; every pass after the upload moves
    # only index vectors over the link).  Opt-in, NOT inferred from the
    # training config's device_cache flag: a one-shot CLI eval pays
    # upload + decode serially (the streaming path overlaps them), so
    # the cache only wins for repeated/in-process evals.  Single-process
    # only (multi-host cached eval would decode into non-addressable
    # devices — those runs keep the per-host streaming loader).
    import jax

    use_cache = bool(getattr(args, "cached", False))
    if use_cache and not device_fe:
        raise SystemExit("evaluate --cached requires device_frontend: "
                         "true in the config")
    if use_cache and jax.process_count() > 1:
        print("evaluate --cached is single-process; falling back to the "
              "streaming loader", file=sys.stderr)
        use_cache = False
    if use_cache:
        cfg.device_cache = True   # _build_loader's cache branch gate
    loader = _build_loader(cfg, vocab, cfg.test_scp_path,
                           cfg.test_lab_path, cfg.test_trans_path,
                           train=False, device_fe=device_fe,
                           mesh=session.mesh, allow_cache=use_cache)
    from mdd_tpu.data.device_cache import CachedLoader

    if isinstance(loader, CachedLoader):
        session.attach_cache(loader.cache)
    evaluate_model(session, loader, dump_dir=args.dump_dir)
    return 0


def _build_engine(args):
    """Shared InferenceEngine construction for `infer` and `serve`."""
    from mdd_tpu.frontend.cmvn import parse_kaldi_cmvn_text
    from mdd_tpu.infer import InferenceEngine
    from mdd_tpu.lexicon.dictionary import Phonetic
    from mdd_tpu.utils.config import load_config

    cfg = load_config(args.conf)
    session, vocab, model_cfg = _load_eval_session(cfg, args.checkpoint)
    denoiser = None
    if args.denoise:
        # the native denoise stage replaces the reference's eeo_apm_test,
        # which the demo runs on *every* wav (infer.py:486-516); built on
        # demand, with an explicit warning if no toolchain is available
        from mdd_tpu import native

        # native_available() loads (building on demand) the DENOISER lib
        # specifically — ensure_built() covers all native libs and would
        # report unavailable if only an unrelated one failed to build
        if native.native_available():
            denoiser = native.spectral_denoise
        else:
            print("warning: native denoiser unavailable (no C++ toolchain); "
                  "proceeding without denoise", file=sys.stderr)
    return InferenceEngine(
        model_cfg,
        session.variables, vocab,
        cmvn=parse_kaldi_cmvn_text(args.cmvn),
        phonetic=Phonetic(asset_dir=args.dict_dir,
                          ecdict_csv=args.ecdict_csv),
        decode_type=cfg.decode_type, beam_width=cfg.beam_width,
        lm_path=cfg.lm_path or None, lm_alpha=cfg.lm_alpha,
        left_ctx=cfg.left_ctx, right_ctx=cfg.right_ctx,
        n_skip_frame=cfg.n_skip_frame, n_downsample=cfg.n_downsample,
        denoiser=denoiser,
        use_ipa=args.phonetic_format == "ipa",
        forgiving=args.forgiving)


def cmd_infer(args) -> int:
    engine = _build_engine(args)
    engine.diagnose_dir(args.wav_transcript_path,
                        textgrid_dir=args.textgrid_path,
                        decode_dump=args.decode_dump)
    return 0


def cmd_serve(args) -> int:
    """Persistent diagnosis server: load the model + dictionary once,
    answer line-delimited JSON requests on stdin until EOF (serve.py —
    the production counterpart of the reference demo, whose own RTF
    report shows per-invocation init dominating wall clock)."""
    from mdd_tpu.serve import SocketServer, serve_loop

    engine = _build_engine(args)
    if args.warmup:
        # precompile the serving shape set so no client request pays a
        # jit compile (moves the ~minutes of tunnel compiles to startup)
        n_shapes = engine.warmup(max_seconds=args.warmup)
        print(f"warmed {n_shapes} shapes", file=sys.stderr, flush=True)
    log = (None if args.quiet else
           (lambda m: print(m, file=sys.stderr, flush=True)))
    if args.socket:
        server = SocketServer(engine, args.socket,
                              max_batch=args.max_batch, log=log)
        addr = (f"port {server.port}" if server.port is not None
                else args.socket)
        print(f"ready on {addr}", file=sys.stderr, flush=True)
        try:
            n = server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()
            n = server.n_served
    else:
        print("ready", file=sys.stderr, flush=True)
        n = serve_loop(engine, sys.stdin, sys.stdout, log=log,
                       max_batch=args.max_batch)
    print(f"served {n} requests", file=sys.stderr)
    return 0


def cmd_mdd_result(args) -> int:
    """Score decode dumps: the result/mdd_result.sh:6-13 pipeline
    (compute-wer PER report + 3-way hierarchical MDD analysis) over trn
    files as produced by `evaluate --dump-dir` or the reference's
    committed result/{ref,human_seq,hyp}."""
    from mdd_tpu.evals.analysis import mdd_result
    from mdd_tpu.evals.wer import read_trn

    mdd_result(read_trn(args.ref), read_trn(args.human),
               read_trn(args.hyp), out_dir=args.detail_dir)
    return 0


def cmd_benchmark(args) -> int:
    import bench

    bench.main()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mdd_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    q = sub.add_parser("prepare-timit", help="TIMIT -> data dir")
    q.add_argument("--timit-dir", required=True)
    q.add_argument("--out", required=True)
    q.add_argument("--speakers-file")
    q.add_argument("--phoneme-map", default="60-41")
    q.set_defaults(fn=cmd_prepare_timit)

    q = sub.add_parser("prepare-l2arctic", help="L2-ARCTIC -> data dirs")
    q.add_argument("--l2-dir", required=True)
    q.add_argument("--out-root", required=True)
    q.add_argument("--fold-reduced", action="store_true",
                   help="fold ah0/er0 into ah/er (39-phone recipe)")
    q.set_defaults(fn=cmd_prepare_l2arctic)

    q = sub.add_parser("merge", help="merge data dirs")
    q.add_argument("--dirs", nargs="+", required=True)
    q.add_argument("--out", required=True)
    q.set_defaults(fn=cmd_merge)

    q = sub.add_parser("units", help="build modelling units")
    q.add_argument("--phn-text", required=True)
    q.add_argument("--out", required=True)
    q.set_defaults(fn=cmd_units)

    q = sub.add_parser("feat", help="extract acoustic features")
    q.add_argument("--wav-scp", required=True)
    q.add_argument("--out-dir", required=True)
    q.add_argument("--feat-type", default="fbank",
                   choices=["fbank", "mfcc", "spectrogram"],
                   help="feature type (make_feat.sh feat_type parity)")
    q.add_argument("--name", default="fbank")
    q.add_argument("--cmvn", help="existing CMVN stats (else trained here)")
    q.add_argument("--batch-size", type=int, default=16)
    q.set_defaults(fn=cmd_feat)

    q = sub.add_parser("train-lm", help="train bigram phone LM")
    q.add_argument("--phn-text", required=True)
    q.add_argument("--out", required=True)
    q.set_defaults(fn=cmd_train_lm)

    q = sub.add_parser("train", help="train the CTC-attention model")
    q.add_argument("--conf", required=True)
    q.add_argument("--distributed", action="store_true",
                   help="multi-host run: call jax.distributed.initialize() "
                        "before building the mesh (run on every host)")
    q.add_argument("--profile-dir",
                   help="capture a jax.profiler device trace of the run "
                        "into this directory (view with XProf/TensorBoard)")
    q.add_argument("--resume", action="store_true",
                   help="continue from the experiment's 'latest' "
                        "checkpoint (params, optimizer, LR scheduler and "
                        "loss histories are restored; no reference "
                        "equivalent — the reference only saves its final "
                        "best model)")
    q.set_defaults(fn=cmd_train)

    q = sub.add_parser("evaluate", help="MDD evaluation on the test set")
    q.add_argument("--conf", required=True)
    q.add_argument("--checkpoint")
    q.add_argument("--dump-dir")
    q.add_argument("--decode-type", dest="decode_type",
                   help="override the config's decode_type (e.g. Greedy "
                        "vs Beam for ablation runs)")
    q.add_argument("--lm-alpha", dest="lm_alpha", type=float,
                   help="override the config's LM fusion weight "
                        "(0 disables the LM term in the beam)")
    q.add_argument("--cached", action="store_true",
                   help="pin the test set in HBM (row-sharded device "
                        "cache) and decode transfer-free — wins for "
                        "repeated evals; a one-shot eval is faster on "
                        "the default streaming loader")
    q.add_argument("--distributed", action="store_true",
                   help="multi-host run: each host decodes its own test "
                        "shard; tallies are summed via all_reduce_report "
                        "(run the same command on every host)")
    q.set_defaults(fn=cmd_evaluate)

    q = sub.add_parser("infer", help="single-word diagnosis demo")
    q.add_argument("--wav-transcript-path", required=True)
    q.add_argument("--conf", required=True)
    q.add_argument("--checkpoint")
    q.add_argument("--cmvn", required=True)
    q.add_argument("--dict-dir")
    q.add_argument("--ecdict-csv",
                   help="ECDICT csv for Chinese word translations "
                        "(reference dict/phonetic_dict.py:168-242)")
    q.add_argument("--denoise", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="run the native denoise stage on every wav "
                        "(default on — the reference demo denoises every "
                        "input, infer.py:506-507); --no-denoise disables")
    q.add_argument("--forgiving", type=int, choices=[0, 1, 2],
                   default=None,
                   help="forgive confusable-phone substitutions at this "
                        "g_pairs level (reference infer.py:69-153; off "
                        "by default = the reference's strict criterion)")
    q.add_argument("--phonetic-format", choices=["cmu", "ipa"],
                   default="cmu")
    q.add_argument("--textgrid-path",
                   help="canonical phones from N.TextGrid files instead "
                        "of G2P (reference --phonetic transcript mode)")
    q.add_argument("--decode-dump", help="write decode_seq.txt here")
    q.set_defaults(fn=cmd_infer)

    q = sub.add_parser("serve", help="persistent diagnosis server "
                                     "(line-delimited JSON on stdin)")
    q.add_argument("--conf", required=True)
    q.add_argument("--checkpoint")
    q.add_argument("--cmvn", required=True)
    q.add_argument("--dict-dir")
    q.add_argument("--ecdict-csv")
    q.add_argument("--denoise", action=argparse.BooleanOptionalAction,
                   default=True)
    q.add_argument("--forgiving", type=int, choices=[0, 1, 2], default=None)
    q.add_argument("--phonetic-format", choices=["cmu", "ipa"],
                   default="cmu")
    q.add_argument("--quiet", action="store_true",
                   help="no per-request log lines on stderr")
    q.add_argument("--warmup", type=float, nargs="?", const=3.2,
                   default=0.0, metavar="SECONDS",
                   help="precompile the serving shape set for wavs up "
                        "to SECONDS (default 3.2) before accepting "
                        "requests — no client pays a jit compile")
    q.add_argument("--socket", metavar="ADDR",
                   help="listen on 'host:port' (TCP) or a unix-socket "
                        "path instead of stdin/stdout; concurrent "
                        "clients share cross-client dynamic batching")
    q.add_argument("--max-batch", type=int, default=16,
                   help="dynamic-batching group size cap (default 16)")
    q.set_defaults(fn=cmd_serve)

    q = sub.add_parser("mdd-result",
                       help="score decode dumps (mdd_result.sh pipeline)")
    q.add_argument("--ref", required=True,
                   help="canonical phones trn (result/ref format)")
    q.add_argument("--human", required=True,
                   help="human-annotated phones trn (result/human_seq)")
    q.add_argument("--hyp", required=True,
                   help="decoded phones trn (result/hyp)")
    q.add_argument("--detail-dir",
                   help="emit Kaldi-format *_detail alignment files here")
    q.set_defaults(fn=cmd_mdd_result)

    q = sub.add_parser("benchmark", help="training-throughput benchmark")
    q.set_defaults(fn=cmd_benchmark)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
