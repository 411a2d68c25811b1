"""Run the FULL 92-pair VKITTI edit-benchmark protocol end-to-end on a
synthetic on-disk fixture, timing all three stages.

Chain (README.md:153-189 protocol):
  1. semantic_test  --test_img benchmark      (92 source label PNGs)
  2. geometric_main --source gt --edit_json   (92 edited 2.5D map sets)
  3. edit_benchmark                            (92 regenerations + L1/LPIPS)

The fixture (scripts/make_vkitti_fixture.py) is a real-layout VKITTI
replica, so this locks the whole harness — file contracts, naming, GT
decoding, op matching — and yields an honest per-stage wall-clock for the
edits/sec headline (cli/edit_benchmark.py --chain_times).

Usage:
  python scripts/benchmark_dryrun.py [--limit N] [--out benchmark_dryrun.json]
        [--compute_dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EDIT_JSON = "/root/reference/assets/vkitti_edit_benchmark.json"
MATRIX_ROW_KEYS = ("fused", "batched8", "pipelined8", "pipelined16",
                   "maskrcnn", "maskrcnn_pipelined8")


def _git_head():
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def run(cmd, env=None):
    print("+", " ".join(cmd[:6]) + (" ..." if len(cmd) > 6 else ""),
          flush=True)
    e = dict(os.environ)
    e["PYTHONPATH"] = REPO + os.pathsep + e.get("PYTHONPATH", "")
    # persistent XLA compilation cache: the serving-matrix rows re-run
    # the same programs in fresh processes; without this every row pays
    # the full multi-minute jit compile chunk again
    e.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sdn3d_jax_cache")
    if env:
        e.update(env)
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, env=e, cwd=REPO)
    return time.perf_counter() - t0


def module_cmd(py, module, mod_args, platform):
    """Build a stage invocation.  platform='cpu' forces the CPU backend
    via jax.config BEFORE backend init (the preregistered TPU plugin
    wins over the JAX_PLATFORMS env var on this machine) — lets the full
    protocol run when the TPU relay is down, at CPU speed."""
    if platform == "cpu":
        boot = ("import sys, runpy, jax; "
                "jax.config.update('jax_platforms', 'cpu'); "
                f"sys.argv[0] = {module!r}; "
                f"runpy.run_module({module!r}, run_name='__main__')")
        return [py, "-c", boot] + mod_args
    return [py, "-m", module] + mod_args


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", default="/tmp/sdn3d_benchmark_dryrun")
    ap.add_argument("--limit", type=int, default=None,
                    help="run only the first N edit pairs (smoke mode)")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "benchmark_dryrun.json"))
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"],
                    help="cpu = force the CPU backend in every stage "
                         "(TPU relay down / reproducibility runs)")
    ap.add_argument("--fused", action="store_true",
                    help="also run the fused single-process chain "
                         "(cli/edit_chain) over the same fixture and "
                         "record its numbers as result_fused")
    ap.add_argument("--fused_only", action="store_true",
                    help="skip the 3-CLI stages; run only the fused "
                         "chain (fixture is still (re)generated) and "
                         "merge result_fused into an existing --out "
                         "file if one is present")
    ap.add_argument("--batch_pairs", type=int, default=1,
                    help="fused-chain pairs per device program "
                         "(cli/edit_chain --batch_pairs)")
    ap.add_argument("--serving_matrix", action="store_true",
                    help="run the fused chain back-to-back in THREE "
                         "configurations — unbatched gt, batch_pairs=8 "
                         "gt, unbatched maskrcnn (detection in-path) — "
                         "in one session with identical cache policy, "
                         "and write all rows + per-phase breakdowns "
                         "into ONE artifact (reconciles the round-2 "
                         "batched-vs-unbatched contradiction; VERDICT "
                         "items 2+3)")
    ap.add_argument("--phases", action="store_true",
                    help="pass --phases to the fused chain runs")
    ap.add_argument("--rows", default=None,
                    help="comma list restricting --serving_matrix to a "
                         "subset of its five rows (keys: fused, "
                         "batched8, pipelined8, maskrcnn, "
                         "maskrcnn_pipelined8); other rows keep their "
                         "previous values in --out")
    args = ap.parse_args()
    if args.fused_only:
        args.fused = True
    if args.rows:
        unknown = set(args.rows.split(",")) - set(MATRIX_ROW_KEYS)
        if unknown:
            ap.error("unknown --rows key(s) %s; known: %s"
                     % (sorted(unknown), ",".join(MATRIX_ROW_KEYS)))

    work = args.work
    os.makedirs(work, exist_ok=True)
    fixture = os.path.join(work, "vkitti")
    segm_dir = os.path.join(work, "segm")
    geo_dir = os.path.join(work, "geo")
    tex_dir = os.path.join(work, "tex")

    with open(EDIT_JSON) as f:
        items = json.load(f)
    n_pairs = len(items) // 2
    if args.limit:
        n_pairs = min(args.limit, n_pairs)
        # keep the two-half structure: first n edit items + their
        # reconstruction twins
        items = items[:n_pairs] + items[len(items) // 2:
                                        len(items) // 2 + n_pairs]
    full_json = os.path.join(work, "benchmark.json")
    with open(full_json, "w") as f:
        json.dump(items, f)
    # geometric processes exactly the 92 edit entries (first half)
    geo_json = os.path.join(work, "benchmark_edits.json")
    with open(geo_json, "w") as f:
        json.dump(items[:n_pairs], f)

    py = sys.executable
    times = {}

    times["fixture_s"] = run([
        py, os.path.join(REPO, "scripts/make_vkitti_fixture.py"),
        fixture, full_json])

    def run_fused(out, source="gt", batch_pairs=None, key="result_fused",
                  wall_key="fused_chain_s", limit=None, pipeline=False):
        """Run the fused single-process chain over the fixture; record
        its result row + wall-clock into `out`."""
        fused_dir = os.path.join(work, "fused_" + key)
        cmd = [
            "--edit_json", full_json, "--data_root", fixture,
            "--shapenet_root", "/root/reference/geometric/assets",
            "--source", source, "--results_dir", fused_dir,
            "--batch_pairs", str(batch_pairs or args.batch_pairs),
            "--compute_dtype", args.compute_dtype]
        if pipeline:
            # NOTE: never combined with --phases — the phase barriers
            # (utils/phases.block) would serialize exactly the overlap
            # the pipelined mode exists to create
            cmd.append("--pipeline")
        elif args.phases:
            cmd.append("--phases")
        if limit:
            cmd += ["--limit", str(limit)]
        fused_s = run(module_cmd(py, "sdn3d_tpu.cli.edit_chain", cmd,
                                 args.platform))
        with open(os.path.join(fused_dir, "benchmark.json")) as f:
            out[key] = json.load(f)
        out.setdefault("stage_wall_s", {})[wall_key] = round(fused_s, 2)

    if args.serving_matrix:
        out = {"pairs": n_pairs, "stage_wall_s": {}}
        if os.path.exists(args.out):
            with open(args.out) as f:
                out = json.load(f)
        # three rows, one session, identical cache policy: each run is a
        # fresh process paying its own jit compiles (steady_s_per_pair
        # excludes the compile chunk in every row, so rows compare
        # like-for-like)
        rows = (set(args.rows.split(",")) if args.rows else
                set(MATRIX_ROW_KEYS))
        # per-row provenance: which invocation/commit actually measured
        # each row (a --rows re-land leaves the other rows' values and
        # provenance untouched, so the artifact records its own mix)
        prov = out.setdefault("row_provenance", {})
        stamp = {"commit": _git_head(),
                 "invocation_rows": ",".join(sorted(rows)),
                 "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                      time.gmtime())}
        if "fused" in rows:
            run_fused(out, source="gt", batch_pairs=1,
                      key="result_fused", wall_key="fused_chain_s")
            prov["fused"] = dict(stamp)
        if "batched8" in rows:
            run_fused(out, source="gt", batch_pairs=8,
                      key="result_fused_batched8",
                      wall_key="fused_batched8_chain_s")
            prov["batched8"] = dict(stamp)
        if "pipelined8" in rows:
            run_fused(out, source="gt", batch_pairs=8, pipeline=True,
                      key="result_fused_pipelined8",
                      wall_key="fused_pipelined8_chain_s")
            prov["pipelined8"] = dict(stamp)
        if "pipelined16" in rows:
            # r5 addition: deeper chunks amortize dispatch further
            # (measured ~10% over pipelined8 with a back-to-back
            # control, NOTES_ROUND5)
            run_fused(out, source="gt", batch_pairs=16, pipeline=True,
                      key="result_fused_pipelined16",
                      wall_key="fused_pipelined16_chain_s")
            prov["pipelined16"] = dict(stamp)
        if "maskrcnn" in rows:
            run_fused(out, source="maskrcnn", batch_pairs=1,
                      key="result_fused_maskrcnn",
                      wall_key="fused_maskrcnn_chain_s")
            prov["maskrcnn"] = dict(stamp)
        if "maskrcnn_pipelined8" in rows:
            run_fused(out, source="maskrcnn", batch_pairs=8,
                      pipeline=True,
                      key="result_fused_maskrcnn_pipelined8",
                      wall_key="fused_maskrcnn_pipelined8_chain_s")
            prov["maskrcnn_pipelined8"] = dict(stamp)
        back_to_back = rows == set(MATRIX_ROW_KEYS)
        out["serving_matrix_note"] = (
            ("all fused rows measured back-to-back in one serving_matrix "
             "invocation on the same device; " if back_to_back else
             "PARTIAL re-land: only rows [%s] were re-measured this "
             "invocation — other rows keep values from earlier "
             "invocations (see row_provenance for the per-row "
             "commit/timestamp mix); " % ",".join(sorted(rows)))
            + "gt rows differ only in "
            "--batch_pairs/--pipeline (pipelined rows never carry "
            "--phases: the attribution barriers would serialize the "
            "overlap being measured); the maskrcnn rows run Mask R-CNN "
            "detection in-path per source frame (keep-<=16-largest, "
            "scripts/main.py:812-818) with random detector weights — "
            "protocol/timing-honest, not quality-meaningful")
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out, indent=2))
        return

    if args.fused_only:
        out = {"pairs": n_pairs, "stage_wall_s": {}}
        if os.path.exists(args.out):
            with open(args.out) as f:
                out = json.load(f)
        run_fused(out)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out, indent=2))
        return

    times["semantic_s"] = run(module_cmd(
        py, "sdn3d_tpu.cli.semantic_test", [
            "--test_img", "benchmark", "--edit_json", full_json,
            "--data_root", fixture, "--result", segm_dir,
            "--compute_dtype", args.compute_dtype], args.platform))

    times["geometric_s"] = run(module_cmd(
        py, "sdn3d_tpu.cli.geometric_main", [
            "--do", "test", "--mode", "extend", "--source", "gt",
            "--vkitti_root", fixture, "--edit_json", geo_json,
            "--output_dir", geo_dir,
            "--shapenet_root", "/root/reference/geometric/assets",
            "--compute_dtype", args.compute_dtype], args.platform))

    chain_file = os.path.join(work, "chain_times.json")
    with open(chain_file, "w") as f:
        json.dump({"semantic_s": times["semantic_s"],
                   "geometric_s": times["geometric_s"]}, f)

    times["textural_s"] = run(module_cmd(
        py, "sdn3d_tpu.cli.edit_benchmark", [
            "--edit_json", full_json, "--data_root", fixture,
            "--segm_dir", segm_dir, "--geo_dir", geo_dir,
            "--results_dir", tex_dir, "--chain_times", chain_file],
        args.platform))

    with open(os.path.join(tex_dir, "benchmark.json")) as f:
        bench = json.load(f)

    out = {
        "pairs": n_pairs,
        "stage_wall_s": {k: round(v, 2) for k, v in times.items()},
        "result": bench,
        "note": ("synthetic-fixture protocol dryrun: random weights, "
                 "fixture frames; locks the 3-stage harness + honest "
                 "end-to-end wall-clock, NOT image quality"),
    }

    if args.fused:
        run_fused(out)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
