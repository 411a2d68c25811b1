"""XLA cost-analysis (flops/bytes -> MFU) for the four serving device
phases of the fused edit chain: sem.infer, geo.encode, geo.render,
tex.generate (VERDICT r4 missing #3 / item 1).

Method: wrap the jit factories of the production programs with
first-call recorders, drive the REAL fused chain (cli/edit_chain) over
the standard benchmark fixture at production shapes for a couple of
pairs, then AOT-lower each recorded program with its captured arguments
and read `compiled.cost_analysis()`.  Combining each phase's flops with
the committed steady time (`benchmark_dryrun.json` ->
result_fused.phase_breakdown[phase].steady_avg_s) gives achieved
TFLOP/s and %-of-peak per phase; results merge back into the artifact
under "phase_roofline".

The geo.render program contains the Pallas raster kernel, which is
opaque to XLA cost analysis (counted as 0 flops) — its own roofline is
measured separately (scripts/prof_roofline.py); the row carries a note.

Usage: python scripts/serving_flops.py [--out benchmark_dryrun.json]
       [--limit 2] [--platform default|cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EDIT_JSON = "/root/reference/assets/vkitti_edit_benchmark.json"

recorded = {}


def _wrap_factory(mod, name, phase):
    """Replace a module-level jit factory so the first call of its
    produced function records (fn, args, kwargs) for AOT lowering."""
    orig = getattr(mod, name)

    def factory(*fa, **fk):
        fn = orig(*fa, **fk)

        def wrapped(*a, **k):
            recorded.setdefault(phase, (fn, a, k))
            return fn(*a, **k)

        return wrapped

    setattr(mod, name, factory)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "benchmark_dryrun.json"))
    ap.add_argument("--work", default="/tmp/sdn3d_serving_flops")
    ap.add_argument("--limit", type=int, default=2)
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"])
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import sdn3d_tpu.pipelines.derender_infer as di
    import sdn3d_tpu.pipelines.semantic as sem_mod
    import sdn3d_tpu.pipelines.textural as tex_mod

    _wrap_factory(sem_mod, "_jitted_multiscale_label", "sem.infer")
    _wrap_factory(di, "_encode_jit", "geo.encode")
    _wrap_factory(di, "_render_composite_jit", "geo.render")
    _wrap_factory(di, "_render_composite_batch_jit", "geo.render")

    # tex.generate: the jitted fake_inference is an instance attribute
    # built in TexturalTrainer.__post_init__ — wrap it post-init
    orig_post = tex_mod.TexturalTrainer.__post_init__

    def post(self):
        orig_post(self)
        fn = self.fake_inference_jit

        def wrapped(*a, **k):
            recorded.setdefault("tex.generate", (fn, a, k))
            return fn(*a, **k)

        self.fake_inference_jit = wrapped

    tex_mod.TexturalTrainer.__post_init__ = post

    # fixture: first `limit` benchmark pairs at production shapes
    from make_vkitti_fixture import build_fixture

    os.makedirs(args.work, exist_ok=True)
    with open(EDIT_JSON) as f:
        items = json.load(f)
    n = len(items) // 2
    lim = min(args.limit, n)
    items = items[:lim] + items[n:n + lim]
    edit_json = os.path.join(args.work, "edit.json")
    with open(edit_json, "w") as f:
        json.dump(items, f)
    root = os.path.join(args.work, "vkitti")
    build_fixture(root, edit_json)

    from sdn3d_tpu.cli.edit_chain import main as chain_main

    chain_main(["--edit_json", edit_json, "--data_root", root,
                "--shapenet_root", "/root/reference/geometric/assets",
                "--results_dir", os.path.join(args.work, "out"),
                "--compute_dtype", args.compute_dtype])

    from sdn3d_tpu.utils.flops import compiled_costs, mfu_row

    out = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    steady = {
        k: v.get("steady_avg_s")
        for k, v in out.get("result_fused", {}).get("phase_breakdown",
                                                    {}).items()}

    roofline = {}
    for phase in ("sem.infer", "geo.encode", "geo.render", "tex.generate"):
        if phase not in recorded:
            roofline[phase] = {"error": "phase program never invoked"}
            continue
        fn, a, k = recorded[phase]
        costs = compiled_costs(fn.lower(*a, **k).compile())
        row = mfu_row(costs["flops"], costs["bytes"],
                      steady.get(phase) or 0.0)
        if steady.get(phase):
            row["steady_s"] = steady[phase]
        if phase == "geo.render":
            row["mfu_note"] = ("flops exclude the Pallas raster kernel "
                               "(opaque to XLA cost analysis; roofline: "
                               "scripts/prof_roofline.py)")
        roofline[phase] = row
        print(phase, json.dumps(row), flush=True)

    import jax
    roofline["_note"] = (
        "flops/bytes from XLA cost analysis of the EXACT production "
        "programs (captured in a %s-pair fused-chain run, dtype %s, "
        "device %s); steady_s and the derived TFLOP/s / %%-peak use the "
        "committed result_fused.phase_breakdown steady times"
        % (lim, args.compute_dtype, jax.devices()[0].device_kind))
    out["phase_roofline"] = roofline
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(roofline, indent=2))


if __name__ == "__main__":
    main()
