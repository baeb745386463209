"""DSIR importance weighting (stages/dsir.py)."""

import numpy as np
import pyarrow as pa


def _ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _corpus(rng, words, n, ln=12):
    return [" ".join(rng.choice(words, ln)) for _ in range(n)]


def test_importance_weights_separate_domains(ray_session):
    from sqlgrep_ray.stages.dsir import importance_weights, select_target_like
    from sqlgrep_ray.stages.lmscore import train_char_lm

    rng = np.random.default_rng(9)
    med = ["patient", "dosage", "clinical", "trial", "symptom", "therapy"]
    web = ["click", "subscribe", "offer", "deal", "shop", "trending"]
    target = train_char_lm(_ds(_corpus(rng, med, 60)))
    background = train_char_lm(_ds(_corpus(rng, med + web, 60)))

    probe_med = " ".join(rng.choice(med, 10))
    probe_web = " ".join(rng.choice(web, 10))
    rows = {
        r["doc_id"]: r
        for r in importance_weights(
            _ds([probe_med, probe_web]), target, background
        ).take_all()
    }
    assert rows[0]["log_ratio_per_char"] > rows[1]["log_ratio_per_char"]
    assert rows[0]["log_ratio_per_char"] > 0  # target-like scores positive

    picked = {
        r["doc_id"]
        for r in select_target_like(
            _ds([probe_med, probe_web]), target, background
        ).take_all()
    }
    assert 0 in picked and 1 not in picked


def test_importance_weights_zero_for_same_model(ray_session):
    from sqlgrep_ray.stages.dsir import importance_weights
    from sqlgrep_ray.stages.lmscore import train_char_lm

    m = train_char_lm(_ds(["alpha beta gamma delta"]))
    r = importance_weights(_ds(["alpha beta"]), m, m).take_all()[0]
    assert abs(r["log_ratio_per_char"]) < 1e-12
