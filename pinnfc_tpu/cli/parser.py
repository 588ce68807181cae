"""Command-line interface for the whole pipeline.

The reference has no CLI beyond script 02's argparse (02:446-453); every
stage here is a subcommand over the shared ``F01_output.mat`` contract:

    python -m pinnfc_tpu.cli train    --mat-out F01_output.mat [--small]
    python -m pinnfc_tpu.cli auc      --mat F01_output.mat
    python -m pinnfc_tpu.cli gmm      --mat F01_output.mat
    python -m pinnfc_tpu.cli risk     --mat F01_output.mat
    python -m pinnfc_tpu.cli compare  --mat F01_output.mat
    python -m pinnfc_tpu.cli run-all  --out-dir /tmp/out [--small]
"""

from __future__ import annotations

import argparse
from typing import Optional

from pinnfc_tpu.cli.admin import cmd_bench, cmd_doctor, cmd_warmup
from pinnfc_tpu.cli.diagnose import (
    cmd_auc,
    cmd_compare,
    cmd_conformal,
    cmd_gmm,
    cmd_report,
    cmd_risk,
)
from pinnfc_tpu.cli.explain import (
    cmd_explain,
    cmd_identify,
    cmd_inspect,
    cmd_whatif,
)
from pinnfc_tpu.cli.export import cmd_export_model
from pinnfc_tpu.cli.run_all import cmd_run_all
from pinnfc_tpu.cli.serve import cmd_monitor, cmd_serve
from pinnfc_tpu.cli.train import cmd_ensemble, cmd_score, cmd_synth, cmd_train


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(prog="pinnfc_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="staged PINN training + MC export (stage 01)")
    t.add_argument("--mat-out", default="F01_output.mat")
    t.add_argument("--ckpt", default=None)
    t.add_argument("--small", action="store_true", help="reduced schedule/data")
    t.add_argument("--steps-scale", type=float, default=None,
                   help="multiply every stage's step count (quick experiments)")
    t.add_argument("--seed", type=int, default=42)
    t.add_argument(
        "--data-parallel", action="store_true",
        help="shard batch rows over all visible devices",
    )
    t.add_argument("--plot-dir", default=None)
    t.add_argument("--n-normal", type=int, default=None,
                   help="synthetic normal rows (default 6000; 1500 with --small)")
    t.add_argument("--n-fault", type=int, default=None,
                   help="rows per fault segment (default 800; 200 with --small)")
    t.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the pipeline")
    t.add_argument("--metrics-jsonl", default=None,
                   help="write structured run metrics: one JSONL row per "
                        "stage (final loss + subsampled loss trace) plus a "
                        "final row with the metric/timing tables")
    t.add_argument("--skip-nonfinite", action="store_true",
                   help="skip (don't apply) training steps with non-finite "
                        "loss/grads instead of letting NaN poison the run — "
                        "the reference's try/except-and-continue loops "
                        "(01:1204-1286); clean runs agree to ~1 ulp/step")
    t.add_argument("--tensorboard-dir", default=None,
                   help="write TensorBoard scalar event files (per-stage "
                        "loss curves + final metrics; no TF/torch needed)")
    t.add_argument("--precision", choices=("highest", "default"), default=None,
                   help="MXU matmul precision: 'highest' = torch-parity f32 "
                        "(the default); 'default' = bf16 throughput mode "
                        "(~2.6x steps/s, PERFORMANCE.md)")
    t.add_argument("--resume-dir", default=None,
                   help="schedule snapshot dir: a killed run restarted with "
                        "the same flags resumes and reproduces the trajectory")
    t.add_argument("--ckpt-every", type=int, default=None,
                   help="with --resume-dir: snapshot every N steps WITHIN "
                        "each stage (mid-stage preemption safety)")
    t.add_argument("--normal-mat", default=None,
                   help="real campaign: normal-operation .mat (e.g. Polar-1.mat)")
    t.add_argument("--fault-dir", default=None,
                   help="real campaign: directory with the 12 fault .mat files "
                        "(<type>_<108|270|405>A.mat, Chinese or ASCII stems)")
    t.set_defaults(fn=cmd_train)

    sc = sub.add_parser(
        "score",
        help="score a NEW campaign with an existing checkpoint — normalize "
             "through the checkpoint's scalers, MC-dropout export, no "
             "retraining (the reference must re-run the 42k-step schedule)",
    )
    sc.add_argument("--ckpt", required=True, help="checkpoint from `train --ckpt`")
    sc.add_argument("--mat-out", default="F01_scored.mat")
    sc.add_argument("--plot-dir", default=None,
                    help="emit the script-01 figure set for the scored "
                         "artifact (uncertainty/detailed/split/temp)")
    sc.add_argument("--small", action="store_true",
                    help="reduced MC sample count / synthetic data size")
    sc.add_argument("--seed", type=int, default=None,
                    help="MC key seed (default: the checkpoint's training "
                         "seed from its .meta.json sidecar, which makes "
                         "scoring the training campaign bit-exact; 42 for "
                         "pre-metadata checkpoints)")
    sc.add_argument("--ignore-ckpt-config", action="store_true",
                    help="ignore the checkpoint's stored training config "
                         "and build the MC-export settings from CLI flags "
                         "alone")
    sc.add_argument("--n-normal", type=int, default=None,
                    help="synthetic normal rows (default 6000; 1500 with --small)")
    sc.add_argument("--n-fault", type=int, default=None,
                    help="rows per fault segment (default 800; 200 with --small)")
    sc.add_argument("--normal-mat", default=None,
                    help="new campaign: normal-operation .mat")
    sc.add_argument("--fault-dir", default=None,
                    help="new campaign: directory with the 12 fault .mat files")
    sc.add_argument("--data-parallel", action="store_true",
                    help="shard the MC export's rows over all visible devices")
    sc.set_defaults(fn=cmd_score)

    sy = sub.add_parser(
        "synth",
        help="write a synthetic campaign in the reference's 13-file .mat "
             "layout — a runnable stand-in for the (non-redistributable) "
             "Zenodo measurement data",
    )
    sy.add_argument("--out-dir", required=True)
    sy.add_argument("--n-normal", type=int, default=6000,
                    help="normal-operation rows (before the loader's "
                         "50<I<800 filter)")
    sy.add_argument("--n-fault", type=int, default=800,
                    help="rows per fault segment")
    sy.add_argument("--seed", type=int, default=0)
    sy.add_argument("--zh-names", action="store_true",
                    help="use the Chinese fault-file stems the reference "
                         "ships (default: ASCII aliases)")
    sy.set_defaults(fn=cmd_synth)

    ins = sub.add_parser(
        "inspect",
        help="describe a checkpoint: provenance metadata, parameter tree, "
             "stored normalization ranges (no device work)",
    )
    ins.add_argument("--ckpt", required=True)
    ins.add_argument("--json", action="store_true",
                     help="machine-readable output (meta, param shapes, "
                          "named λ values, scaler ranges, step)")
    ins.set_defaults(fn=cmd_inspect)

    idf = sub.add_parser(
        "identify",
        help="identifiability of the 17 physics λ's: Gauss-Newton 95%% CIs "
             "+ sensitivity + at-bound/unidentifiable flags at the trained "
             "optimum",
    )
    idf.add_argument("--ckpt", required=True)
    idf.add_argument("--mat", required=True,
                     help="exported F01_output.mat supplying the input rows")
    idf.add_argument("--json", action="store_true")
    idf.add_argument("--plot-dir", default=None,
                     help="save the relative-CI identifiability figure here")
    idf.add_argument("--data-parallel", action="store_true",
                     help="shard the residual Jacobian rows over all "
                          "visible devices")
    idf.set_defaults(fn=cmd_identify)

    xp = sub.add_parser(
        "explain",
        help="input-channel saliency: which measured input the voltage "
             "prediction (and its aleatoric σ) leans on, per fault class",
    )
    xp.add_argument("--ckpt", required=True)
    xp.add_argument("--mat", required=True,
                    help="exported F01_output.mat supplying rows + labels")
    xp.add_argument("--json", action="store_true")
    xp.add_argument("--plot-dir", default=None,
                    help="save the class × channel saliency heatmaps here")
    xp.add_argument("--data-parallel", action="store_true",
                    help="shard the Jacobian rows over all visible devices")
    xp.set_defaults(fn=cmd_explain)

    wi = sub.add_parser(
        "whatif",
        help="counterfactual recovery: per alarmed risk condition, the "
             "minimal in-distribution actuation whose predicted voltage "
             "gain covers the measured shortfall below the alarm line",
    )
    wi.add_argument("--ckpt", required=True)
    wi.add_argument("--mat", required=True,
                    help="exported F01_output.mat supplying rows + labels")
    wi.add_argument("--steps", type=int, default=400,
                    help="Adam iterations of the inverse solve (default 400)")
    wi.add_argument("--lr", type=float, default=0.05,
                    help="step size in normalized-input units (default 0.05)")
    wi.add_argument("--alpha", type=float, default=0.05,
                    help="minimal-actuation penalty weight (default 0.05)")
    wi.add_argument("--margin", type=float, default=0.01,
                    help="volts above the alarm line to target (default 0.01)")
    wi.add_argument("--actuate", default=None,
                    help="comma-separated channels the solver may move "
                         "(default: all but current and coolant_t_out)")
    wi.add_argument("--max-rows", type=int, default=64,
                    help="cap alarmed rows per condition, subsampled evenly")
    wi.add_argument("--absolute-target", action="store_true",
                    help="target the model's own prediction clearing the "
                         "alarm line instead of the default gain target "
                         "(Δv̂ covering the measured shortfall)")
    wi.add_argument("--json", action="store_true")
    wi.add_argument("--plot-dir", default=None,
                    help="save the condition × channel actuation heatmap here")
    wi.add_argument("--data-parallel", action="store_true",
                    help="shard the solve rows over all visible devices")
    wi.set_defaults(fn=cmd_whatif)

    cf = sub.add_parser(
        "conformal",
        help="split-conformal coverage analysis of an exported artifact: "
             "distribution-free voltage intervals calibrated on normal "
             "rows, per-fault miscoverage, calibrated anomaly p-values",
    )
    cf.add_argument("--mat", required=True)
    cf.add_argument("--alpha", type=float, default=0.1,
                    help="miscoverage level (default 0.1 → 90%% intervals)")
    cf.add_argument("--score", choices=("adaptive", "absolute"),
                    default="adaptive",
                    help="adaptive = |res|/sqrt(ale²+epi²) (width tracks "
                         "the model's σ̂); absolute = |res| (the score the "
                         "streaming monitor evaluates online)")
    cf.add_argument("--calib-frac", type=float, default=0.5,
                    help="fraction of normal rows consumed for calibration "
                         "(rest = honest held-out coverage; default 0.5)")
    cf.add_argument("--seed", type=int, default=0,
                    help="calibration/evaluation split seed (default 0)")
    cf.add_argument("--json", action="store_true")
    cf.add_argument("--plot-dir", default=None,
                    help="save the per-class coverage/p-value figure here")
    cf.set_defaults(fn=cmd_conformal)

    ex = sub.add_parser(
        "export-model",
        help="serialize the checkpoint's eval-mode scorer to a "
             "self-contained StableHLO artifact (jax.export): weights + "
             "scalers baked in, any batch size, multi-platform",
    )
    ex.add_argument("--ckpt", required=True)
    ex.add_argument("--out", required=True,
                    help="output artifact path (a .meta.json provenance "
                         "sidecar is written alongside)")
    ex.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering targets (default cpu,tpu)")
    ex.add_argument("--monitor-step", action="store_true",
                    help="export the full streaming RF(t) block step "
                         "(state in/out as a plain tuple; μ/σ runtime "
                         "inputs) instead of the plain scorer")
    ex.add_argument("--fleet-step", action="store_true",
                    help="with --monitor-step: export observe_many's "
                         "VMAPPED fleet program instead (symbolic stream "
                         "axis AND block size) — artifact deployments "
                         "advance a whole fleet in one dispatch instead "
                         "of S sequential calls")
    ex.add_argument("--head", default=None,
                    help="with --monitor-step: bake this DiagnosisHead "
                         "(.npz) in for online fault typing")
    ex.add_argument("--glitch-alarm-n", type=int, default=None,
                    help="with --monitor-step: bake this consecutive-glitch "
                         "sensor-alarm threshold in (default: the monitor's)")
    ex.add_argument("--conformal-mat", default=None,
                    help="with --monitor-step: bake calibrated anomaly "
                         "p-values in, calibrated on this artifact's normal "
                         "rows (|res| scores)")
    ex.add_argument("--conformal-alpha", type=float, default=None,
                    help="α recorded in the sidecar for the low-p counter "
                         "(default 0.1)")
    ex.add_argument("--conformal-gamma", type=float, default=None,
                    help="with --conformal-mat: bake the adaptive conformal "
                         "step size γ into the step — deployed streams "
                         "carry a drift-tracked alarm level α_t whose "
                         "long-run alarm rate stays at α* (default 0: "
                         "static level)")
    ex.set_defaults(fn=cmd_export_model)

    for name, fn, extra in (
        ("auc", cmd_auc, {"auc": True}),
        ("gmm", cmd_gmm, {"tsne": True, "data_parallel": True}),
        ("risk", cmd_risk, {}),
        ("compare", cmd_compare, {"methods": True}),
    ):
        s = sub.add_parser(name, help=f"stage {name} over F01_output.mat")
        s.add_argument("--mat", default="F01_output.mat")
        s.add_argument("--plot-dir", default=None)
        if name == "risk":
            # warning times are integer threshold crossings; both backends
            # agree on the full campaign (tested), 'jax' stays the default
            # for the on-device serving/monitor parity path
            s.add_argument(
                "--backend", choices=("jax", "numpy"), default="jax",
                help="RF recurrences: 'jax' (f32 on-device scans) or "
                     "'numpy' (f64 lfilter, bit-parity with the reference)",
            )
        if extra.get("methods"):
            s.add_argument(
                "--methods", default=None,
                help="comma list: gmm,logreg,svm,kmeans,agglomerative,spectral",
            )
        if extra.get("auc"):  # script-02 argparse parity (02:446-453)
            s.add_argument("--group-spec", default=None)
            s.add_argument("--test-size", type=float, default=None)
            s.add_argument("--balanced", action="store_true", default=None)
            s.add_argument("--no-balanced", dest="balanced", action="store_false")
            s.add_argument("--show-coef", type=int, default=0,
                           help="print top-N LR coefficients per class")
            s.add_argument("--list-features", action="store_true")
        if extra.get("data_parallel"):
            s.add_argument(
                "--data-parallel", action="store_true",
                help="row-shard the GMM EM fit over all visible devices",
            )
        if extra.get("tsne"):
            s.add_argument("--tsne", action="store_true",
                           help="also write a t-SNE figure (CPU, slow)")
            s.add_argument(
                "--init", choices=("kmeans", "sklearn"), default=None,
                help="EM init: on-device k-means++ (default) or sklearn "
                     "GaussianMixture's own kmeans init (reference-exact "
                     "starting point)",
            )
        s.set_defaults(fn=fn)

    rp = sub.add_parser(
        "report",
        help="one-file markdown report: every downstream stage's findings "
             "over an artifact, plus provenance and the figure gallery",
    )
    rp.add_argument("--mat", default="F01_output.mat")
    rp.add_argument("--ckpt", default=None,
                    help="checkpoint for the provenance section")
    rp.add_argument("--plot-dir", default=None,
                    help="existing figures directory to link as the gallery")
    rp.add_argument("--out", default=None,
                    help="output path (default: report.md next to --mat)")
    rp.add_argument("--baseline", default=None,
                    help="baseline artifact (.mat) for a direction-aware "
                         "metric diff — the retrain/rescore regression check")
    rp.add_argument("--sections", default=None,
                    help="comma subset of: provenance,overview,auc,gmm,"
                         "risk,compare,conformal,identifiability,saliency,"
                         "figures")
    rp.add_argument("--json", action="store_true",
                    help="print the artifact metric vector as JSON instead "
                         "of writing markdown (CI regression tracking)")
    rp.add_argument("--json-out", default=None,
                    help="also write the metric vector to this path "
                         "(run-all drops metrics.json next to report.md)")
    rp.set_defaults(fn=cmd_report)

    r = sub.add_parser("run-all", help="full pipeline 01→02/03/04/05")
    # (--seed default None: the train stage falls back to 42; the
    # --from-ckpt score stage falls back to the checkpoint's training seed)
    r.add_argument("--out-dir", required=True)
    r.add_argument("--from-ckpt", default=None,
                   help="skip training: score the campaign with this "
                        "existing checkpoint (see `score`), then run every "
                        "downstream stage on the scored artifact")
    r.add_argument("--small", action="store_true")
    r.add_argument("--steps-scale", type=float, default=None,
                   help="multiply every stage's step count")
    r.add_argument("--seed", type=int, default=None)
    r.add_argument("--normal-mat", default=None,
                   help="real campaign: normal-operation .mat")
    r.add_argument("--fault-dir", default=None,
                   help="real campaign: directory with the 12 fault .mat files")
    r.set_defaults(fn=cmd_run_all)

    e = sub.add_parser("ensemble", help="many-seed parallel PINN ensemble")
    e.add_argument("--members", type=int, default=8)
    e.add_argument("--steps", type=int, default=2000)
    e.add_argument("--mesh-shape", default=None, metavar="MxD",
                   help="hybrid 2-D mesh, e.g. 4x2: members over M devices, "
                        "each member's batch rows over D devices")
    e.add_argument("--small", action="store_true")
    e.add_argument("--seed", type=int, default=42)
    e.add_argument("--uq", action="store_true",
                   help="deep-ensemble mixture-moment UQ on the test split, "
                        "compared against member-0 MC dropout")
    e.add_argument("--uq-mc-times", type=int, default=256,
                   help="MC-dropout samples for the --uq comparison")
    e.set_defaults(fn=cmd_ensemble)

    m = sub.add_parser("monitor", help="streaming replay through OnlineMonitor")
    m.add_argument("--mat", default="F01_output.mat")
    m.add_argument("--ckpt", required=True, help="checkpoint from `train --ckpt`")
    m.add_argument("--block", type=int, default=64, help="samples per block")
    m.add_argument("--fault-label", type=int, default=None,
                   help="replay only this fault segment (1..12) after a lead-in")
    m.add_argument("--lead", type=int, default=200,
                   help="normal lead-in rows before the fault segment")
    m.add_argument("--diagnose", action="store_true",
                   help="attach the script-03 GMM head: classify the fault "
                        "type online while the RF warns")
    m.add_argument("--head", default=None,
                   help="load a saved diagnosis head (.npz) instead of "
                        "fitting one from the artifact")
    m.add_argument("--save-head", default=None,
                   help="persist the fitted diagnosis head (.npz)")
    m.add_argument("--glitch-alarm-n", type=int, default=None,
                   help="sensor_alarm after N consecutive non-finite samples")
    m.add_argument("--fleet", action="store_true",
                   help="replay ALL 12 (current, fault) risk conditions "
                        "(04:145-161) as concurrent streams — one vmapped "
                        "observe_many dispatch per lockstep block")
    m.add_argument("--data-parallel", action="store_true",
                   help="with --fleet: shard the stream axis over all "
                        "visible devices (collective-free)")
    m.add_argument("--whatif", action="store_true",
                   help="after the replay, solve the gain-mode "
                        "counterfactual over the alarmed tail: the minimal "
                        "in-training-range actuation whose predicted "
                        "voltage gain covers the measured shortfall below "
                        "the stream's dynamic alarm line")
    m.add_argument("--conformal", action="store_true",
                   help="calibrated anomaly p-values per sample, calibrated "
                        "on the artifact's normal rows (uq/conformal |res| "
                        "score); prints the normal-vs-fault anomaly rate")
    m.add_argument("--conformal-alpha", type=float, default=0.1,
                   help="p<α counts as a calibrated anomaly (default 0.1)")
    m.add_argument("--conformal-gamma", type=float, default=0.0,
                   help="with --conformal: adaptive conformal step size γ "
                        "(Gibbs & Candès ACI) — the alarm level α_t tracks "
                        "drift so the long-run alarm rate stays at α*; the "
                        "replayed stream's final α_t is a calibrated drift "
                        "gauge (0 = static level, default)")
    m.set_defaults(fn=cmd_monitor)

    sv = sub.add_parser(
        "serve",
        help="HTTP scoring endpoint (POST /observe, /observe_many, /reset; "
             "GET /health, /metrics)",
    )
    sv.add_argument("--mat", default="F01_output.mat",
                    help="artifact for the normal-operation μ/σ statistics")
    sv.add_argument("--ckpt", default=None, help="checkpoint from `train --ckpt`")
    sv.add_argument("--artifact", default=None,
                    help="serve from an `export-model --monitor-step` "
                         "StableHLO artifact instead of a checkpoint (risk "
                         "config/glitch threshold/class names adopted from "
                         "its .meta.json sidecar)")
    sv.add_argument("--head", default=None,
                    help="saved diagnosis head (.npz) for online fault typing")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8787)
    sv.add_argument("--max-requests", type=int, default=None,
                    help="stop after N requests (bounded demos/tests)")
    sv.add_argument("--glitch-alarm-n", type=int, default=None,
                    help="sensor_alarm after N consecutive non-finite samples")
    sv.add_argument("--state-path", default=None,
                    help="preemption-safe serving: snapshot the per-stream "
                         "RF(t) state bank here after every request and "
                         "restore it on restart (atomic npz)")
    sv.add_argument("--data-parallel", action="store_true",
                    help="shard /observe_many's stream axis over all visible "
                         "devices (fleet scoring is collective-free; capacity "
                         "scales linearly with chips)")
    sv.add_argument("--conformal", action="store_true",
                    help="with --ckpt: serve calibrated anomaly p-values, "
                         "calibrated on --mat's normal rows (/observe gains "
                         "conformal_p; /metrics a low-p counter)")
    sv.add_argument("--conformal-alpha", type=float, default=None,
                    help="p<α counts as a calibrated anomaly (default 0.1, "
                         "or the artifact sidecar's recorded value)")
    sv.add_argument("--conformal-gamma", type=float, default=None,
                    help="with --ckpt --conformal: adaptive conformal step "
                         "size γ — each stream's alarm level α_t tracks "
                         "drift (/observe gains aci_alpha/aci_anomaly; "
                         "/metrics a per-stream α_t gauge). Baked in for "
                         "artifacts (`export-model --conformal-gamma`)")
    sv.set_defaults(fn=cmd_serve)

    dr = sub.add_parser(
        "doctor",
        help="deployment self-check: env, caches, backend probe, "
             "checkpoint/artifact pre-flight (bounded; relay-outage safe)",
    )
    dr.add_argument("--platform", default=None,
                    help="pin the probed backend (e.g. 'cpu' to bypass a "
                         "stalled relay, 'axon' to demand the TPU)")
    dr.add_argument("--probe-timeout", type=float, default=600.0,
                    help="seconds before the backend probe subprocess is "
                         "declared stalled (default 600)")
    dr.add_argument("--skip-probe", action="store_true",
                    help="skip backend initialization entirely (filesystem/"
                         "env checks only — never touches the relay)")
    dr.add_argument("--smoke", action="store_true",
                    help="also run 101 toy Adam steps end-to-end in a "
                         "bounded subprocess (compile+execute+readback)")
    dr.add_argument("--ckpt", default=None,
                    help="pre-flight a checkpoint: raw CPU load + sidecar")
    dr.add_argument("--artifact", default=None,
                    help="pre-flight a StableHLO artifact: deserialize and "
                         "report its lowered platforms (no execution)")
    dr.add_argument("--json", action="store_true",
                    help="emit the check list as one JSON array")
    dr.set_defaults(fn=cmd_doctor)

    wu = sub.add_parser(
        "warmup",
        help="pre-compile the production program set into the persistent "
             "cache (AOT, nothing executed) — a cold box otherwise pays "
             "15+ min of remote compiles at first use",
    )
    wu.add_argument("--small", action="store_true",
                    help="warm the --small schedule/data-size programs")
    wu.add_argument("--seed", type=int, default=42,
                    help="data seed (shapes are data-dependent; match the "
                         "training run you are warming for)")
    wu.add_argument("--steps-scale", type=float, default=None,
                    help="multiply every stage's step count (must match "
                         "the training flags — scan lengths are static)")
    wu.add_argument("--n-normal", type=int, default=None)
    wu.add_argument("--n-fault", type=int, default=None)
    wu.add_argument("--normal-mat", default=None,
                    help="real campaign: warm for ITS row counts")
    wu.add_argument("--fault-dir", default=None)
    wu.add_argument("--precision", choices=("highest", "default"),
                    default=None)
    wu.add_argument("--skip-nonfinite", action="store_true")
    wu.add_argument("--ckpt", default=None,
                    help="also warm the serving monitor step for this "
                         "checkpoint (its scalers are baked into the "
                         "program, so the real checkpoint is required)")
    wu.add_argument("--mat", default=None,
                    help="also warm the downstream-diagnosis programs "
                         "(AUC/GMM/risk/compare) for this artifact by "
                         "running the four cheap pipelines once")
    wu.add_argument("--block", type=int, default=64,
                    help="monitor block size to warm (with --ckpt)")
    wu.add_argument("--json", action="store_true")
    wu.set_defaults(fn=cmd_warmup)

    b = sub.add_parser("bench", help="headline benchmark (one JSON line)")
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)

    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    return args.fn(args)
