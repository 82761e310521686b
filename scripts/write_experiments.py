"""Render EXPERIMENTS.md from recorded sweep results.

Inputs (all produced by the round-4 harnesses; nothing is re-run here):
  save/repro_gender_row/gender/repro_stats.json   (stage 1: ACC on orig audio)
  save/repro_gender_row/asr/repro_stats.json      (stage 1.5: tiny-ASR WER)
  save/repro_gender_row/sweep_results.jsonl       (scripts/round4_sweep.py)
  save/repro_gender_row/vocoder_ab.jsonl          (scripts/vocoder_ab.py)

The prose is generated FROM the numbers (VERDICT r3 weak #1: the round-3
doc claimed a mechanism its own table no longer showed). The headline row
is the sweep variant with the best privacy at acceptable utility; if no
variant moves the external evaluator materially, the doc says so.

  python scripts/write_experiments.py
"""
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.path.join(REPO, "save", "repro_gender_row")
# save/ is untracked and does not survive a VM reset; scripts/archive_repro.py
# copies the four result files to this TRACKED directory so the rendered
# tables stay reproducible from the repo alone. Rendering prefers the live
# save/ copies when present.
ARCHIVE = os.path.join(REPO, "artifacts", "repro")


def _resolve(*rel):
    live = os.path.join(WORK, *rel)
    return live if os.path.exists(live) else os.path.join(ARCHIVE, *rel)


def _load_jsonl(path):
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = [json.loads(line) for line in f]
    return rows


def _fmt(x, nd=3):
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return "—"
    return f"{x:.{nd}f}"


def _spread(vals):
    lo, hi = min(vals), max(vals)
    mean = sum(vals) / len(vals)
    return mean, lo, hi


def _require(*rel):
    path = _resolve(*rel)
    if not os.path.exists(path):
        sys.exit(
            f"missing {'/'.join(rel)} in BOTH save/repro_gender_row and "
            "artifacts/repro — run scripts/round4_sweep.py (it rebuilds the "
            "stages and archives every result), then retry"
        )
    return path


def main():
    with open(_require("gender", "repro_stats.json")) as f:
        acc_orig = json.load(f)["acc_orig"]
    with open(_require("asr", "repro_stats.json")) as f:
        wer_asr = json.load(f)["wer"]
    rows = _load_jsonl(_resolve("sweep_results.jsonl"))
    ab = {r["method"]: r for r in _load_jsonl(_resolve("vocoder_ab.jsonl"))}
    if not rows:
        sys.exit("no sweep results recorded — run scripts/round4_sweep.py first")

    # group by variant (seed spread)
    by_variant = {}
    for r in rows:
        by_variant.setdefault(r["variant"], []).append(r)

    # pick the headline: biggest |ACC_ext(anon) - 0.5| REDUCTION vs orig
    # among variants that keep the features decodable (WER_anon within
    # 3x WER_orig + 10 absolute points — the reference's own operating
    # points degrade WER 0.5-12 points, BASELINE.md)
    def privacy(r):  # distance from chance on the EXTERNAL evaluator
        return abs(r["acc_ext_anon"] - 0.5)

    def usable(r):
        wo = r["wer_orig"] if not math.isnan(r["wer_orig"]) else wer_asr
        return r["wer_anon"] <= 3 * wo + 10.0

    def agg(variant):
        rs = by_variant[variant]
        return {
            "variant": variant,
            "n": len(rs),
            "acc_ext_anon": sum(r["acc_ext_anon"] for r in rs) / len(rs),
            "acc_ext_anon_all": [r["acc_ext_anon"] for r in rs],
            "acc_ext_orig": sum(r["acc_ext_orig"] for r in rs) / len(rs),
            "acc_internal": sum(r["acc_internal"] for r in rs) / len(rs),
            "utility": sum(r["utility"] for r in rs) / len(rs),
            "wer_anon": sum(r["wer_anon"] for r in rs) / len(rs),
            "wer_anon_all": [r["wer_anon"] for r in rs],
            "wer_orig": sum(r["wer_orig"] for r in rs) / len(rs),
            "usable": all(usable(r) for r in rs),
            "privacy": sum(privacy(r) for r in rs) / len(rs),
            "model_type": rs[0]["model_type"],
            "epochs": rs[0]["epochs"],
        }

    aggs = [agg(v) for v in by_variant]
    candidates = [a for a in aggs if a["usable"]] or aggs
    best = min(candidates, key=lambda a: a["privacy"])
    # "reproduced" = external evaluator materially off its original-feature
    # accuracy while staying decodable
    reproduced = best["usable"] and (
        best["acc_ext_orig"] - best["acc_ext_anon"] >= 0.25
    )

    lines = []
    lines.append("# Reduced-scale reproduction of the reference research rows\n")
    lines.append(
        "The environment ships no LibriSpeech audio, so the reference's headline\n"
        "rows are reproduced IN KIND on a synthetic formant-rich gendered corpus\n"
        "(16 train + 10 held-out test speakers, F0 M~115 Hz / F~210 Hz, female\n"
        "formants x1.12; each WORD is a fixed phone sequence so the audio carries\n"
        "the transcript — speech_anonymization_tpu/data/synth.py) through the\n"
        "real recipes end-to-end. Scale caveat: absolute numbers are not\n"
        "comparable to LibriSpeech rows.\n"
    )
    if reproduced:
        lines.append(
            f"STATUS: the `{best['variant']}` schedule reproduces the reference's\n"
            "headline DIRECTION — the externally trained evaluator loses the sex\n"
            f"cue on anonymized features (ACC_ext {_fmt(best['acc_ext_orig'])} ->\n"
            f"{_fmt(best['acc_ext_anon'])}) while the features stay decodable\n"
            f"(WER {_fmt(best['wer_orig'],1)}% -> {_fmt(best['wer_anon'],1)}%).\n"
            "The reference direction is 0.96 -> 0.39 at WER 9.11% (fcae) and\n"
            "0.60 -> 0.22 at WER 3.53% (endtoend) — see the sweep table for\n"
            "which mechanisms transfer at reduced scale and which do not.\n"
        )
    else:
        lines.append(
            "STATUS: NO swept schedule reproduces the reference's external-\n"
            "evaluator result at this scale. The internal adversary reaches\n"
            "chance but the external classifier keeps reading the cue (the\n"
            "GRL scrambles its own head, not the feature); the sweep table\n"
            "below is the recorded evidence. The reference direction\n"
            "(ACC_ext 0.96 -> 0.39) therefore remains unreproduced here —\n"
            "see the per-variant rows for how far each mechanism moves it.\n"
        )

    b = best
    lines.append("\n## Headline row (variant `%s`%s)\n" % (
        b["variant"], f", mean of {b['n']} seeds" if b["n"] > 1 else ""))
    lines.append("| Row | Reference (LibriSpeech, full scale) | This repo (synthetic, reduced) |")
    lines.append("|---|---|---|")
    lines.append(f"| Gender ACC, original audio | ~0.96 (results/gender_classifier/1230/train_log.txt) | **{_fmt(acc_orig)}** |")
    lines.append(f"| ACC_external, original features | ~0.96 | **{_fmt(b['acc_ext_orig'])}** |")
    lines.append(f"| ACC_external, ANONYMIZED features | 0.39 (fcae recon0.5/sex0.5) / 0.22 (endtoend resume) | **{_fmt(b['acc_ext_anon'])}** |")
    lines.append(f"| Internal (adversary) ACC on anon | — | {_fmt(b['acc_internal'])} |")
    lines.append(f"| WER, original features | 7.49% (fullyconn_normalize recon1.0) | **{_fmt(b['wer_orig'],1)}%** (tiny-ASR baseline {_fmt(wer_asr,1)}%) |")
    lines.append(f"| WER, ANONYMIZED features | 9.11% (fcae recon0.1/sex0.9) / 3.53% (endtoend resume) | **{_fmt(b['wer_anon'],1)}%** |")
    lines.append(f"| Utility retention (ASR-encoder cosine) | 0.617-0.916 | {_fmt(b['utility'])} |")
    if b["n"] > 1:
        am, alo, ahi = _spread(b["acc_ext_anon_all"])
        wm, wlo, whi = _spread(b["wer_anon_all"])
        lines.append(
            f"\nSeed spread ({b['n']} training seeds): ACC_ext(anon) "
            f"{_fmt(am)} [{_fmt(alo)}, {_fmt(ahi)}]; WER(anon) "
            f"{_fmt(wm,1)}% [{_fmt(wlo,1)}%, {_fmt(whi,1)}%].")

    lines.append("\n## Stage-2 schedule sweep (scripts/round4_sweep.py)\n")
    lines.append(
        "All variants share the cached stage-1 evaluator + stage-1.5 tiny ASR\n"
        "and train only the anonymizer. `e2e*` = model_type=endtoend (trains\n"
        "against the FROZEN external classifier, the reference's 1_5_endtoend\n"
        "family); others = fcae with the internal GRL adversary. `conf`/`mix`\n"
        "use NEGATIVE confusion weights (through a GRL, -w is what 'drive the\n"
        "head to uniform' requires — the round-3 sweep had the sign inverted).\n")
    if not any(r["model_type"] == "endtoend" for r in rows):
        lines.append(
            "NOTE: no `e2e*` (endtoend) rows are recorded below. That family —\n"
            "the reference's BEST mechanism (train the generator directly\n"
            "against the frozen external classifier) — costs ~6.5 min/epoch on\n"
            "this 1-core box and its half-finished round-4 run was lost to a VM\n"
            "reset before any test-set row landed (ROUND4_NOTES.md logs the\n"
            "partial validation signal: ACC_ext falling to ~0.50 with utility\n"
            "recovering under the bounded `e2e_conf` objective). Completing it\n"
            "is the top round-5 item; until then the reference's external-\n"
            "evaluator result is NOT reproduced by any recorded row.\n")
    lines.append("| variant | model | seed | ACC_ext orig | ACC_ext anon | internal | WER orig | WER anon | utility |")
    lines.append("|---|---|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: (r["variant"], r["seed"])):
        lines.append(
            f"| {r['variant']} | {r['model_type']} | {r['seed']} | "
            f"{_fmt(r['acc_ext_orig'])} | **{_fmt(r['acc_ext_anon'])}** | "
            f"{_fmt(r['acc_internal'])} | {_fmt(r['wer_orig'],1)}% | "
            f"{_fmt(r['wer_anon'],1)}% | {_fmt(r['utility'])} |")

    attacks = _load_jsonl(_resolve("attack_results.jsonl"))
    if attacks:
        lines.append("\n## Attack after anonymization (scripts/attack_retrain.py)\n")
        lines.append(
            "A FRESH gender classifier retrained ON the anonymized features\n"
            "(the reference's gender_classifier_train_recon recipe) — the\n"
            "strongest privacy metric: fooling the fixed evaluator is not\n"
            "enough if a retrained attacker recovers the cue.\n")
        lines.append("| variant | seed | retrained-attacker ACC (held-out) |")
        lines.append("|---|---|---|")
        for a in attacks:
            lines.append(f"| {a['variant']} | {a['seed']} | **{_fmt(a['attack_acc'])}** |")

    if len(ab) == 2:
        d = abs(ab["world"]["acc_pitch_norm"] - ab["psola"]["acc_pitch_norm"])
        lines.append("\n## Vocoder-implementation bound (scripts/vocoder_ab.py)\n")
        lines.append(
            "pyworld cannot be installed here, so the divergence of\n"
            "native/world_vocoder.cc from pw.wav2world/pw.synthesize is bounded\n"
            "by a proxy: the pitch-norm recipe conclusion must be invariant to\n"
            "swapping the WORLD-class vocoder for the structurally different\n"
            "TD-PSOLA resynthesis.\n")
        lines.append("| pipeline | gender ACC (held-out) |")
        lines.append("|---|---|")
        lines.append(f"| original audio | {_fmt(ab['world']['acc_orig_audio'])} |")
        lines.append(f"| pitch-normalized, method=world | {_fmt(ab['world']['acc_pitch_norm'])} |")
        lines.append(f"| pitch-normalized, method=psola | {_fmt(ab['psola']['acc_pitch_norm'])} |")
        lines.append(
            f"\n|ACC_world - ACC_psola| = {_fmt(d)}: the downstream conclusion "
            "does not depend on the vocoder implementation." if d <= 0.1 else
            f"\n|ACC_world - ACC_psola| = {_fmt(d)}: the two resynthesis "
            "implementations DISAGREE — treat pitch-norm rows as "
            "vocoder-sensitive.")

    lines.append(
        "\n## Commands\n\n"
        "    python scripts/round4_sweep.py baseline e2e_warm e2e_conf conf grl4 ...\n"
        "    python scripts/round4_sweep.py <winner> --seeds=0,1,2\n"
        "    python scripts/attack_retrain.py <winner> <seed>\n"
        "    python scripts/vocoder_ab.py\n"
        "    python scripts/write_experiments.py\n\n"
        "(recipe chain per run: gender_classifier.yaml 8 epochs ->\n"
        "transformer.yaml tiny ASR (64d, 2+2 layers, beam 4) 40 epochs ->\n"
        "convae.yaml with the variant's adversarial_schedule; lr_adam 0.55\n"
        "for fcae / 0.25 for endtoend variants, n_warmup_steps 100; `*_warm`\n"
        "variants prepend a recon-only phase resumed in place (the\n"
        "reference's endtoend runs resumed recon-pretrained models); external\n"
        "evaluator from stage 1 + ASR from stage 1.5 attached; disjoint test\n"
        "speakers throughout. Deterministic, CPU.)\n")

    out = os.path.join(REPO, "EXPERIMENTS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out} (headline variant: {best['variant']}, "
          f"reproduced={reproduced})")


if __name__ == "__main__":
    main()
