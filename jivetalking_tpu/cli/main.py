"""CLI entry point.

Behavioural rebuild of cmd/jivetalking/main.go: flags `-v/--version`,
`-d/--debug`, `-a/--analyse`, `--diagnostics`, plus input files; bounded
worker pool with jobs = max(1, min(files, NumCPU)); serialised debug sink;
bounded warnings channel printed post-run; per-file error isolation;
ctrl-C cancellation with no temp residue (atomic dot-temp publishes).

No user config file by design ("No configuration", reference README:3) —
all tuning lives in the defaults + adapt_config."""

from __future__ import annotations

import argparse
import os
import signal
import sys
import threading

from .. import __version__
from ..adaptive.config import default_filter_config
from .debugsink import DebugSink
from .pool import PoolEvents, resolve_jobs, run_pool


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="jivetalking-tpu",
        description=(
            "Master raw podcast voice recordings to -16 LUFS / -1 dBTP with "
            "per-file adaptive filter tuning, on TPU."
        ),
        add_help=False,  # the styled renderer owns -h (ref: StyledHelpPrinter)
    )
    p.add_argument("-h", "--help", action="store_true",
                   help="show context-sensitive help")
    p.add_argument("-v", "--version", action="store_true", help="print version and exit")
    p.add_argument("-d", "--debug", action="store_true",
                   help="write a serialised jivetalking-debug.log")
    p.add_argument("-a", "--analyse", action="store_true",
                   help="analysis only: measure + derive config, write analysis artefacts")
    p.add_argument("--diagnostics", action="store_true",
                   help="write .intervals.jsonl / .candidates.jsonl sidecars")
    p.add_argument("--jobs", type=int, default=0,
                   help="worker bound (default: min(files, NumCPU))")
    p.add_argument("--platform", choices=["auto", "cpu"], default="auto",
                   help="compute platform: auto (the environment's accelerator) "
                        "or cpu (force the host CPU)")
    p.add_argument("--cpu-devices", type=int, default=1, metavar="N",
                   help="with --platform cpu: number of virtual CPU devices "
                        "(N>1 exercises the mesh/sharded paths)")
    p.add_argument("--batch-master", action="store_true",
                   help="master ALL files through one batched device program "
                        "(the back-catalogue sweep: pass 2-4 vmapped over a "
                        "dp-sharded episode batch; same rate required)")
    p.add_argument("--resume", action="store_true",
                   help="skip files whose processed output already exists "
                        "(pass-boundary resume for batch runs)")
    p.add_argument("--profile", metavar="DIR", default="",
                   help="write a jax.profiler trace of the run to DIR")
    p.add_argument("files", nargs="*", help="audio files (.wav / .flac / .aiff / .mp3 / .ogg / .opus)")
    return p


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)

    if args.help:
        from .styles import print_help

        print_help(parser)
        return 0
    if args.version:
        from .styles import print_version

        print_version(__version__)
        return 0
    if not args.files:
        from .styles import print_help

        print_help(parser)
        return 2

    from .styles import print_error, print_warning

    missing = [f for f in args.files if not os.path.exists(f)]
    if missing:
        for f in missing:
            print_error(f"no such file: {f}")
        return 1

    if args.resume and not args.analyse:
        from ..report.paths import output_audio_path

        skipped = [f for f in args.files if os.path.exists(output_audio_path(f))]
        args.files = [f for f in args.files if f not in set(skipped)]
        for f in skipped:
            print(f"resume: skipping {f} (output exists)")
        if not args.files:
            print("resume: nothing to do")
            return 0

    if args.platform == "cpu":
        from ..utils.testing import force_cpu_devices

        try:
            force_cpu_devices(max(1, args.cpu_devices))
        except RuntimeError as e:
            # force_cpu_devices raises rather than silently running on the
            # wrong platform/device count (round-1 gate lesson)
            print_error(str(e))
            return 1

    sink = DebugSink.open(args.debug)
    cancel = threading.Event()

    def handle_sigint(signum, frame):
        cancel.set()
        print("\ncancelling...", file=sys.stderr)

    old_handler = signal.signal(signal.SIGINT, handle_sigint)

    warnings: list[str] = []
    from ..ui.console import (
        render_analysis_summary,
        render_done_box,
        render_final_summary,
        render_progress_line,
    )

    lock = threading.Lock()
    last_stage: dict[str, str] = {}
    use_tty = sys.stdout.isatty()

    def on_progress(path, stage, frac):
        # print each stage transition once (plain no-TTY path)
        with lock:
            if last_stage.get(path) != stage:
                last_stage[path] = stage
                print(render_progress_line(path, stage, 0.0), flush=True)

    def on_complete(outcome):
        with lock:
            render = render_analysis_summary if args.analyse else render_done_box
            print(render(outcome), flush=True)

    jobs = args.jobs or resolve_jobs(len(args.files), os.cpu_count() or 1)
    sink.logf("run start: %d files, %d jobs, analyse=%s", len(args.files), jobs, args.analyse)

    profile_ctx = None
    if args.profile:
        import jax

        os.makedirs(args.profile, exist_ok=True)
        profile_ctx = jax.profiler.trace(args.profile)
        profile_ctx.__enter__()

    try:
        if args.batch_master and not args.analyse:
            # back-catalogue sweep: batched Pass-1 + the chunked fused
            # passes vmapped over length-bucketed file batches
            # (parallel/batch.process_back_catalogue; dp-sharded over
            # whatever mesh the platform offers), routed through the SAME
            # artefact spine as the per-file pool
            import jax

            from ..parallel.batch import make_mesh, process_back_catalogue
            from .pool import emit_batch_outcomes

            mesh = make_mesh() if len(jax.devices()) > 1 else None
            try:
                results = process_back_catalogue(
                    args.files, mesh=mesh, base_config=default_filter_config())
            except Exception as e:
                print_error(f"batch master failed: {e}")
                return 1
            events = PoolEvents(
                on_file_complete=on_complete,
                on_warning=lambda w: warnings.append(w),
                on_debug=lambda p, msg: sink.for_file(p)(msg),
            )
            outcomes = emit_batch_outcomes(results, events, args.diagnostics)
            # on_complete already printed each outcome's done box / ✗ line
            failed = [o for o in outcomes if o.error]
            print()
            print(render_final_summary(outcomes))
            for w in warnings:
                print_warning(w)
            return 1 if failed else 0
        if use_tty:
            # live ANSI view (the reference's Bubble Tea models; TTY only —
            # the -a mode gets the AnalysisModel equivalent)
            from ..ui.live import AnalysisLiveUI, LiveUI

            ui_cls = AnalysisLiveUI if args.analyse else LiveUI
            # q in the live view cancels the pool, same as ctrl-C
            # (ref: the Bubble Tea quit keys -> ctx cancel, main.go)
            with ui_cls(args.files, on_quit=cancel.set) as live:
                events = PoolEvents(
                    on_file_start=live.on_file_start,
                    on_duration=live.on_duration,
                    on_progress=live.on_progress,
                    on_adapted=live.on_adapted_summary,
                    on_levels=live.on_levels,
                    on_limiter=live.on_limiter,
                    on_file_complete=live.on_file_complete,
                    on_warning=lambda w: warnings.append(w),
                    on_debug=lambda p, msg: sink.for_file(p)(msg),
                )
                outcomes = run_pool(
                    args.files,
                    base=default_filter_config(),
                    events=events,
                    diagnostics=args.diagnostics,
                    analysis_only=args.analyse,
                    jobs=jobs,
                    cancel=cancel,
                )
        elif args.analyse:
            # No terminal: one up-front banner, then the ordered post-pool
            # loop prints each confirmation in INPUT order — byte-identical
            # stdout for any jobs count (ref: main.go:403-441,
            # TestRunAnalysisOnlyWithDeps_OrderedOutputParityAcrossJobs).
            print(f"Analysing {len(args.files)} files…", flush=True)
            events = PoolEvents(
                on_warning=lambda w: warnings.append(w),
                on_debug=lambda p, msg: sink.for_file(p)(msg),
            )
            outcomes = run_pool(
                args.files,
                base=default_filter_config(),
                events=events,
                diagnostics=args.diagnostics,
                analysis_only=True,
                jobs=jobs,
                cancel=cancel,
            )
            for o in outcomes:
                if o.error == "cancelled":
                    continue  # a user who quit gets no error spew
                if o.error:
                    print_error(f"Analysis failed for {o.path}: {o.error}")
                    continue
                if not o.report_written:
                    continue  # report failed: warning already queued
                print(render_analysis_summary(o), flush=True)
        else:
            events = PoolEvents(
                on_progress=on_progress,
                on_file_complete=on_complete,
                on_warning=lambda w: warnings.append(w),
                on_debug=lambda p, msg: sink.for_file(p)(msg),
            )
            outcomes = run_pool(
                args.files,
                base=default_filter_config(),
                events=events,
                diagnostics=args.diagnostics,
                analysis_only=False,
                jobs=jobs,
                cancel=cancel,
            )
    finally:
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
        signal.signal(signal.SIGINT, old_handler)
        sink.close()

    if not args.analyse:
        print()
        print(render_final_summary(outcomes))
    for w in warnings:
        print_warning(w)

    failed = [o for o in outcomes if o.error and o.error != "cancelled"]
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
