"""p4 alignment + final labeling, and the p2 K-selection driver."""

import os

import numpy as np
import pytest

from deep_interpolation_clustering_tpu import Config
from deep_interpolation_clustering_tpu.cluster import (
    FinalLabeler,
    KSelection,
    align_labels,
    align_labels_with_center,
    generate_align_map,
)
from deep_interpolation_clustering_tpu.info import COHORTS


def _fake_dump(rng, n, k, d=16, t=10, with_dl=False):
    """A synthetic feature dump with planted latent clusters whose SBP
    ordering is the reverse of their raw ids."""
    centers = np.stack([np.full(d, 10.0 * i) for i in range(k)])
    labels = rng.randint(0, k, n)
    hidden = (centers[labels] + rng.randn(n, d) * 0.5).astype(np.float32)
    ob = np.zeros((n, 6, t), np.float32)
    padding = np.zeros((n, 6, t), np.float32)
    padding[:, :, :5] = 1.0
    # cluster i gets mean SBP = 100 + 10*i -> descending order reverses ids
    ob[:, 0, :5] = (100.0 + 10.0 * labels)[:, None] + rng.randn(n, 5) * 0.1
    d_out = {
        "encounter_id": np.array([f"e{i}" for i in range(n)]),
        "hidden": hidden,
        "ob": ob,
        "padding_mask": padding,
    }
    if with_dl:
        q = np.full((n, k), 0.1 / (k - 1), np.float32)
        q[np.arange(n), labels] = 0.9
        d_out["cluster_pred"] = q
        d_out["cluster_label"] = q
    return d_out, labels


def test_generate_align_map_orders_by_descending_sbp(rng):
    d, labels = _fake_dump(rng, 200, 4)
    align_map, aligned, centers = generate_align_map(
        labels.copy(), d["ob"], d["padding_mask"], d["hidden"]
    )
    # raw cluster 3 has the highest SBP -> new id 0
    assert align_map[3] == 0 and align_map[0] == 3
    # relabeling consistent
    np.testing.assert_array_equal(aligned, np.array([align_map[l] for l in labels]))
    assert len(centers) == 4
    # aligned center 0 is the latent mean of raw cluster 3
    np.testing.assert_allclose(
        centers[0], d["hidden"][labels == 3].mean(0), atol=1e-5
    )


def test_align_labels_with_center_bijection(rng):
    d, labels = _fake_dump(rng, 200, 3)
    _, aligned, centers = generate_align_map(
        labels.copy(), d["ob"], d["padding_mask"], d["hidden"]
    )
    # a "validation" cohort with permuted raw ids must align to the same ids
    perm = np.array([2, 0, 1])
    other_raw = perm[labels]
    out = align_labels_with_center(d["hidden"], other_raw.copy(), centers)
    np.testing.assert_array_equal(out, aligned)


def test_final_labeler_kmeans_path(tmp_path, rng):
    cfg = Config(num_clusters=3, kmeans_n_init=5)
    exp = str(tmp_path)
    feat_dir = os.path.join(exp, "out_feat", "ae_mse")
    os.makedirs(feat_dir)
    truth = {}
    for cohort in COHORTS:
        d, labels = _fake_dump(rng, 150, 3)
        np.save(os.path.join(feat_dir, f"{cohort}.npy"), d)
        truth[cohort] = (d, labels)

    results = FinalLabeler(cfg, exp).pred(metrics=["ae_mse"])
    for cohort in COHORTS:
        d, labels = truth[cohort]
        got = results["ae_mse"][cohort]
        # clusters recovered; ids are the SBP-descending relabeling (reverse)
        np.testing.assert_array_equal(got, 2 - labels)
        out_f = os.path.join(
            exp, "out_feat", "ae_mse_kmeans_aligned", f"{cohort}_3.npy"
        )
        saved = np.load(out_f, allow_pickle=True).item()
        np.testing.assert_array_equal(saved["cluster_id"], got)
        assert "ob" not in saved  # dropped like the reference


def test_final_labeler_dl_path(tmp_path, rng):
    cfg = Config(cluster_method="dl")
    exp = str(tmp_path)
    feat_dir = os.path.join(exp, "out_feat", "ae_mse")
    os.makedirs(feat_dir)
    truth = {}
    for cohort in COHORTS:
        d, labels = _fake_dump(rng, 60, 4, with_dl=True)
        np.save(os.path.join(feat_dir, f"{cohort}.npy"), d)
        truth[cohort] = labels
    results = FinalLabeler(cfg, exp).pred(metrics=["ae_mse"])
    for cohort in COHORTS:
        np.testing.assert_array_equal(results["ae_mse"][cohort], truth[cohort])


def test_final_labeler_dbscan_path(tmp_path, rng):
    """Per-cohort DBSCAN fits; training aligned by SBP, valid/test by
    nearest-train-center (reference p4:113-139, 181-239)."""
    cfg = Config(cluster_method="dbscan", opt_eps=5.0)
    exp = str(tmp_path)
    feat_dir = os.path.join(exp, "out_feat", "ae_mse")
    os.makedirs(feat_dir)
    truth = {}
    for cohort in COHORTS:
        d, labels = _fake_dump(rng, 200, 3)
        np.save(os.path.join(feat_dir, f"{cohort}.npy"), d)
        truth[cohort] = labels
    results = FinalLabeler(cfg, exp).pred(metrics=["ae_mse"])
    for cohort in COHORTS:
        got = results["ae_mse"][cohort]
        # planted clusters are 40 apart in latent space at noise 0.5, so
        # DBSCAN recovers the partition exactly (no noise points) and the
        # SBP-descending alignment reverses the raw ids
        np.testing.assert_array_equal(got, 2 - truth[cohort])
        out_f = os.path.join(
            exp, "out_feat", "ae_mse_dbscan_aligned", f"{cohort}_eps-5.0.npy"
        )
        assert os.path.exists(out_f)


def test_dbscan_quality_summary(rng):
    """The cluster-quality pair the reference logs for final dbscan labels
    (p4_clustering_final.py:209-233): silhouette with noise-as-a-cluster
    and silhouette on the denoised subset, skipped when degenerate."""
    from sklearn.metrics import silhouette_score

    from deep_interpolation_clustering_tpu.cluster.optk import dbscan_quality

    x = rng.randn(120, 8).astype(np.float32)
    x[:60] += 10.0
    labels = np.array([0] * 60 + [1] * 55 + [-1] * 5)
    q = dbscan_quality(x, labels)
    assert q["n_clusters"] == 2 and q["n_noise"] == 5
    # rtol 1e-4: the scores now come from the blocked on-device sweep
    # (f32 reduction order) vs sklearn's f64 pairwise pass
    np.testing.assert_allclose(
        q["silhouette_with_noise"], silhouette_score(x, labels), rtol=1e-4
    )
    m = labels != -1
    np.testing.assert_allclose(
        q["silhouette_wo_noise"], silhouette_score(x[m], labels[m]), rtol=1e-4
    )
    # degenerate cases: one cluster -> reference skips the silhouettes
    q1 = dbscan_quality(x, np.zeros(120, np.int64))
    assert q1["n_clusters"] == 1 and "silhouette_with_noise" not in q1


def test_final_labeler_consensus_path(tmp_path, rng):
    """External 1-based consensus CSV labels re-mapped through the
    training SBP align map (reference p4:241-287; train+valid only)."""
    import pandas as pd

    cfg = Config(cluster_method="consensus", num_clusters=3)
    exp = str(tmp_path)
    feat_dir = os.path.join(exp, "out_feat", "ae_mse")
    cons_dir = os.path.join(exp, "out_feat", "raw_consensus_result")
    os.makedirs(feat_dir)
    os.makedirs(cons_dir)
    truth = {}
    for cohort in COHORTS:
        d, labels = _fake_dump(rng, 150, 3)
        np.save(os.path.join(feat_dir, f"{cohort}.npy"), d)
        truth[cohort] = labels
        if cohort in ("training", "validation"):
            pd.DataFrame({"k3": labels + 1}).to_csv(
                os.path.join(cons_dir, f"{cohort}_consensus.csv"), index=False
            )
    results = FinalLabeler(cfg, exp).pred(metrics=["ae_mse"])
    assert set(results["ae_mse"].keys()) == {"training", "validation"}
    for cohort in ("training", "validation"):
        np.testing.assert_array_equal(
            results["ae_mse"][cohort], 2 - truth[cohort]
        )


def test_kselection_on_mesh_matches_single_device(tmp_path, rng):
    """Row-sharding the latents over the 8-device data mesh (GSPMD) must
    reproduce the single-device K-selection: same labels drive the fits,
    so gap/elbow land within float-reduction noise and every K decision
    is identical."""
    from deep_interpolation_clustering_tpu.parallel import make_mesh

    cfg = Config(k_max=5, n_init=3, gap_b=2)
    d, _ = _fake_dump(rng, 200, 4)
    v, _ = _fake_dump(rng, 80, 4)
    single = KSelection(cfg, str(tmp_path / "single"))
    meshed = KSelection(cfg, str(tmp_path / "meshed"), mesh=make_mesh(8))

    e1 = single.elbow(d["hidden"], v["hidden"], plot=False)
    e2 = meshed.elbow(d["hidden"], v["hidden"], plot=False)
    assert e1["elbow_k"] == e2["elbow_k"]
    np.testing.assert_allclose(e1["train"], e2["train"], rtol=1e-4)

    g1 = single.gap_statistic(d["hidden"], version=1, plot=False)
    g2 = meshed.gap_statistic(d["hidden"], version=1, plot=False)
    assert g1["opt_k"] == g2["opt_k"]
    assert g1["opt_k_argmax"] == g2["opt_k_argmax"]
    for r1, r2 in zip(g1["rows"], g2["rows"]):
        assert r1["k"] == r2["k"]
        np.testing.assert_allclose(r1["gap"], r2["gap"], atol=1e-4)

    # non-divisible rows fall back to unsharded placement, still correct
    g3 = meshed.gap_statistic(d["hidden"][:199], version=1, plot=False)
    assert g3["rows"][0]["k"] == 2


def test_kselection_device_resident_latents(tmp_path, rng):
    """elbow/gap accept device-resident latents (jax arrays) without a
    host round-trip: distortions and the gap's `act` inertia column are
    IDENTICAL to the np-input path (the data fits share PRNG keys; only
    the gap's uniform reference draws use a different — on-device — MC
    stream), and the device-moments fingerprint makes the CSV reuse gate
    work for device inputs too."""
    import jax.numpy as jnp

    cfg = Config(k_max=4, n_init=2, gap_b=2)
    x = rng.randn(60, 8).astype(np.float32)
    xd = jnp.asarray(x)

    host = KSelection(cfg, str(tmp_path / "host"))
    dev = KSelection(cfg, str(tmp_path / "dev"))
    e1 = host.elbow(x, x, plot=False)
    e2 = dev.elbow(xd, xd, plot=False)
    assert e1["elbow_k"] == e2["elbow_k"]
    np.testing.assert_array_equal(e1["train"], e2["train"])

    g1 = host.gap_statistic(x, version=1, plot=False)
    g2 = dev.gap_statistic(xd, version=1, plot=False)
    for r1, r2 in zip(g1["rows"], g2["rows"]):
        assert r1["k"] == r2["k"]
        assert r1["act"] == r2["act"]  # same keys + bits -> same fit
    # device-input CSV reuse: same latents -> table reused untouched
    mtime = os.stat(g2["csv"]).st_mtime_ns
    g3 = dev.gap_statistic(xd, version=1, plot=False)
    assert os.stat(g3["csv"]).st_mtime_ns == mtime
    assert [r["k"] for r in g3["rows"]] == [r["k"] for r in g2["rows"]]
    # changed device latents -> moments digest mismatch -> recompute
    g4 = dev.gap_statistic(xd + 1.0, version=1, plot=False)
    assert os.stat(g4["csv"]).st_mtime_ns != mtime


def test_gap_reuse_fingerprint_guard(tmp_path, rng):
    """The gap-CSV reuse gate is fingerprinted: changed latents recompute
    (the reference's existence-only gate silently returns the stale table,
    p2:281-287), and a truncated table recomputes instead of crashing."""
    cfg = Config(k_max=4, n_init=2, gap_b=2)
    x = rng.randn(60, 8).astype(np.float32)
    sel = KSelection(cfg, str(tmp_path))
    gap = sel.gap_statistic(x, version=1, plot=False)
    mtime = os.stat(gap["csv"]).st_mtime_ns
    # same latents + config: reused untouched
    gap2 = sel.gap_statistic(x, version=1, plot=False)
    assert os.stat(gap2["csv"]).st_mtime_ns == mtime
    # different latents: fingerprint mismatch -> recompute + rewrite
    y = (x + 1.0).astype(np.float32)
    gap3 = sel.gap_statistic(y, version=1, plot=False)
    mtime3 = os.stat(gap3["csv"]).st_mtime_ns
    assert mtime3 != mtime
    # header-only table (killed mid-pipeline): empty-guard recomputes
    with open(gap3["csv"], "w", newline="") as f:
        f.write("k,gap\n")
    gap4 = sel.gap_statistic(y, version=1, plot=False)
    assert gap4["rows"] and [r["k"] for r in gap4["rows"]] == [2, 3, 4]
    # a fingerprint sidecar from an older run layout (absent) also recomputes
    os.remove(gap4["csv"] + ".fp")
    gap5 = sel.gap_statistic(y, version=1, plot=False)
    assert gap5["rows"] == gap4["rows"]


def test_kselection_elbow_and_gap(tmp_path, rng):
    cfg = Config(k_max=6, n_init=3, gap_b=3)
    d, _ = _fake_dump(rng, 200, 4)
    v, _ = _fake_dump(rng, 80, 4)
    sel = KSelection(cfg, str(tmp_path))
    out = sel.elbow(d["hidden"], v["hidden"], plot=False)
    assert len(out["train"]) == 5
    # distortion decreases with K
    assert out["train"][0] > out["train"][-1]
    assert out["elbow_k"] == 4  # planted K

    gap = sel.gap_statistic(d["hidden"], version=1, plot=False)
    assert os.path.exists(gap["csv"])
    ks = [r["k"] for r in gap["rows"]]
    assert ks == [2, 3, 4, 5, 6]
    # gap rises until the planted K then flattens/drops -> Tibshirani picks <= 4
    assert gap["opt_k"] is not None and gap["opt_k"] <= 4
    # argmax fallback always exists (for monotone gap curves where the
    # Tibshirani rule never fires)
    assert gap["opt_k_argmax"] in ks
    # internal metrics present
    assert "Sihouette" in gap["rows"][0]

    # re-run without overwrite: the table is reloaded from CSV, not
    # recomputed (reference p2:281-287 — at 100k scale a recompute is
    # minutes of k-means); summary and rows come out identical. The
    # figure surface (reference p2:276-332) regenerates from the reloaded
    # rows: gap error-bar plot, gap/ref/act overlay, internal-metric panels.
    mtime = os.stat(gap["csv"]).st_mtime_ns
    gap2 = sel.gap_statistic(d["hidden"], version=1, plot=True)
    assert os.stat(gap2["csv"]).st_mtime_ns == mtime  # CSV untouched
    assert gap2["opt_k"] == gap["opt_k"]
    assert gap2["opt_k_argmax"] == gap["opt_k_argmax"]
    for r, r2 in zip(gap["rows"], gap2["rows"]):
        assert set(r2) == set(r)
        for key in r:
            assert r2[key] == pytest.approx(r[key])
    for png in (
        "gap_statistic-1_v1.png",
        "gap_statistic-2_v1.png",
        "internal_metrics_v1.png",
    ):
        assert os.path.exists(os.path.join(sel.out_path, png)), png

    # overwrite=True forces the recompute and rewrites the CSV
    sel_ow = KSelection(cfg.replace(overwrite=True), str(tmp_path))
    gap3 = sel_ow.gap_statistic(d["hidden"], version=1, plot=False)
    assert os.stat(gap3["csv"]).st_mtime_ns != mtime
    assert [r["k"] for r in gap3["rows"]] == ks


def test_gap_subsample_approximates_full(tmp_path, rng):
    """Config.gap_subsample runs the whole sweep on a seeded uniform
    subsample (the 1M-scale opt-in — the exact inertias are O(n²) by the
    reference's definition, p2:334-351): on a well-separated cohort the
    subsampled gap curve must agree with the full sweep's K selection and
    track its gap values; the fingerprint keeps the two regimes' cached
    tables apart."""
    import jax.numpy as jnp

    d, _ = _fake_dump(rng, 600, 4)
    cfg_full = Config(k_max=6, n_init=3, gap_b=3)
    full = KSelection(cfg_full, str(tmp_path / "full")).gap_statistic(
        d["hidden"], version=1, plot=False
    )
    cfg_sub = Config(k_max=6, n_init=3, gap_b=3, gap_subsample=200)
    sel_sub = KSelection(cfg_sub, str(tmp_path / "sub"))
    sub = sel_sub.gap_statistic(d["hidden"], version=1, plot=False)
    # the Tibshirani selection (the actual rule) agrees; argmax on the
    # near-flat post-K tail is a coin flip and carries no contract
    assert sub["opt_k"] == full["opt_k"] == 4
    for rf, rs in zip(full["rows"], sub["rows"]):
        assert abs(rf["gap"] - rs["gap"]) < 0.25, (rf["k"], rf["gap"], rs["gap"])

    # device-resident input takes the on-device subsample path (different
    # but equally-valid Monte-Carlo stream — at gap_b=3 the Tibshirani
    # tie-break between the flat K>=4 rows can land on either side, so the
    # contract here is that the curve TRACKS the full sweep)
    sub_dev = KSelection(cfg_sub, str(tmp_path / "subdev")).gap_statistic(
        jnp.asarray(d["hidden"]), version=1, plot=False
    )
    for rf, rs in zip(full["rows"], sub_dev["rows"]):
        assert abs(rf["gap"] - rs["gap"]) < 0.25, (rf["k"], rf["gap"], rs["gap"])

    # subsample size participates in the reuse fingerprint: a different
    # size recomputes instead of silently reusing the cached table
    import os as _os

    mtime = _os.stat(sub["csv"]).st_mtime_ns
    again = sel_sub.gap_statistic(d["hidden"], version=1, plot=False)
    assert _os.stat(again["csv"]).st_mtime_ns == mtime  # same size: reused
    sel_other = KSelection(
        Config(k_max=6, n_init=3, gap_b=3, gap_subsample=150),
        str(tmp_path / "sub"),
    )
    changed = sel_other.gap_statistic(d["hidden"], version=1, plot=False)
    assert _os.stat(changed["csv"]).st_mtime_ns != mtime
