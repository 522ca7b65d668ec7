"""Multi-host data parallelism (parallel/multihost.py).

Two cooperating CPU processes (4 virtual devices each) drive the full p1
CLI over one global 8-device mesh via `jax.distributed` + Gloo, and the
run must reproduce a single-process 8-device run of the SAME config: the
mesh math is identical — only the placement spans processes — so the
dumped latents and the best checkpoints must agree to f32 tolerance.

This is the TPU-idiomatic stand-in for multi-host hardware (SURVEY §2.2's
jax.distributed row): the same code path drives multiple TPU hosts of a
slice, with collectives riding ICI instead of TCP.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

P0_ARGS = [
    "--synthetic", "96", "--synthetic_max_obs", "16",
    "--num_timestamps", "16",
]
P1_ARGS = [
    "--batch_size", "16", "--num_timestamps", "16", "--max_epochs", "2",
    "--data_parallel", "-1", "--early_stopping", "100",
]


def _run(code_args, cwd, n_devices, extra_env=None, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env or {})
    module, args = code_args
    # jax.config.update guards against a sitecustomize that already
    # imported jax with a different platform default
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"from deep_interpolation_clustering_tpu.cli import {module} as m;"
        f"m.main({args!r})"
    )
    return subprocess.Popen(
        [sys.executable, "-c", code], cwd=cwd, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    ), timeout


def _wait(proc_timeout):
    proc, timeout = proc_timeout
    out, _ = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"subprocess failed:\n{out[-4000:]}"
    return out


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_multihost_p2_p4_match_single(tmp_path):
    """The analytics CLIs (p2 K-selection, p4 final labels) run under
    `jax.distributed` too: every process computes (p2's K sweep over the
    global mesh via --data_parallel -1; p4's k-means as replicated local
    compute) and only process 0 writes. Two cooperating processes must
    produce the same CSVs/labels as one process over the same dumps."""
    import shutil

    cache = str(tmp_path / "xlacache")
    cache_args = ["--compilation_cache_dir", cache]

    # one tiny p0+p1 to produce the latent dumps both runs read
    _wait(_run(("p0", P0_ARGS), str(tmp_path), 8))
    _wait(_run(("p1", P1_ARGS + ["--results_path", "Results_single"]
                + cache_args), str(tmp_path), 8))
    shutil.copytree(tmp_path / "Results_single", tmp_path / "Results_multi")

    p2_args = [
        "--restore_metrics", "ae_mse", "--k_max", "4", "--n_init", "2",
        "--gap_b", "2", "--data_parallel", "-1",
    ] + cache_args
    _wait(_run(("p2", p2_args + ["--results_path", "Results_single"]),
               str(tmp_path), 8))
    port = _free_port()
    procs = [
        _run(("p2", p2_args + [
            "--results_path", "Results_multi",
            "--num_processes", "2", "--process_id", str(pid),
            "--coordinator_address", f"127.0.0.1:{port}",
        ]), str(tmp_path), 4)
        for pid in range(2)
    ]
    for p in procs:
        _wait(p)

    import pandas as pd

    for csv in ("gap_sts_v1.csv", "elbow.csv"):
        a = pd.read_csv(
            tmp_path / "Results_single" / "Pretrain" / "opt_k" / "ae_mse"
            / "plot" / csv
        )
        b = pd.read_csv(
            tmp_path / "Results_multi" / "Pretrain" / "opt_k" / "ae_mse"
            / "plot" / csv
        )
        assert list(a.columns) == list(b.columns), csv
        np.testing.assert_allclose(
            a.to_numpy(float), b.to_numpy(float), rtol=1e-5, atol=1e-6,
            err_msg=csv,
        )

    # p4 over the Pretrain dumps (kmeans path); labels must agree exactly
    p4_args = [
        "--stage", "Pretrain", "--restore_metrics", "ae_mse",
        "--cluster_method", "kmeans", "--num_clusters", "3",
        "--kmeans_n_init", "3",
    ] + cache_args
    _wait(_run(("p4", p4_args + ["--results_path", "Results_single"]),
               str(tmp_path), 8))
    port = _free_port()
    procs = [
        _run(("p4", p4_args + [
            "--results_path", "Results_multi",
            "--num_processes", "2", "--process_id", str(pid),
            "--coordinator_address", f"127.0.0.1:{port}",
        ]), str(tmp_path), 4)
        for pid in range(2)
    ]
    for p in procs:
        _wait(p)

    for cohort in ("training", "validation", "testing"):
        a = np.load(
            tmp_path / "Results_single" / "Pretrain" / "out_feat"
            / "ae_mse_kmeans_aligned" / f"{cohort}_3.npy", allow_pickle=True,
        ).item()
        b = np.load(
            tmp_path / "Results_multi" / "Pretrain" / "out_feat"
            / "ae_mse_kmeans_aligned" / f"{cohort}_3.npy", allow_pickle=True,
        ).item()
        np.testing.assert_array_equal(a["encounter_id"], b["encounter_id"])
        np.testing.assert_array_equal(a["cluster_id"], b["cluster_id"])


@pytest.mark.slow
def test_multihost_two_process_matches_single(tmp_path):
    cache = str(tmp_path / "xlacache")
    cache_args = ["--compilation_cache_dir", cache]

    # p0 once (host-side preprocessing; both runs read the same pickles)
    _wait(_run(("p0", P0_ARGS), str(tmp_path), 8))

    # single-process 8-device reference
    single = P1_ARGS + ["--results_path", "Results_single"] + cache_args
    _wait(_run(("p1", single), str(tmp_path), 8))

    # two processes x 4 devices over one global 8-device mesh
    port = _free_port()
    procs = []
    for pid in range(2):
        multi = P1_ARGS + cache_args + [
            "--results_path", "Results_multi",
            "--num_processes", "2", "--process_id", str(pid),
            "--coordinator_address", f"127.0.0.1:{port}",
        ]
        procs.append(_run(("p1", multi), str(tmp_path), 4))
    for p in procs:
        _wait(p)

    # latents dumped by process 0 must match the single-process run
    for cohort in ("training", "validation", "testing"):
        a = np.load(
            tmp_path / "Results_single" / "Pretrain" / "out_feat" / "ae_mse"
            / f"{cohort}.npy", allow_pickle=True,
        ).item()
        b = np.load(
            tmp_path / "Results_multi" / "Pretrain" / "out_feat" / "ae_mse"
            / f"{cohort}.npy", allow_pickle=True,
        ).item()
        np.testing.assert_array_equal(a["encounter_id"], b["encounter_id"])
        np.testing.assert_allclose(a["hidden"], b["hidden"], atol=1e-5)
        # rec_ob is re-normalized to PHYSICAL units (scale ~1e2), so the
        # ~1e-5 cross-process reduction-order drift shows up as ~1e-2 abs.
        # Band: 2x the measured 1.42e-4 max rel (r4, after the masked tail
        # step joined the mesh path — measured IDENTICAL with the sharded
        # and replicated cohort storage, so it is pure reduction-order)
        np.testing.assert_allclose(a["rec_ob"], b["rec_ob"], rtol=3e-4, atol=1e-4)

    # best checkpoints agree to the sharded-vs-single tolerance
    za = np.load(
        tmp_path / "Results_single" / "Pretrain" / "weight" / "ae_mse"
        / "checkpoint.npz"
    )
    zb = np.load(
        tmp_path / "Results_multi" / "Pretrain" / "weight" / "ae_mse"
        / "checkpoint.npz"
    )
    keys_a = sorted(k for k in za.files if k.startswith("params/"))
    assert keys_a == sorted(k for k in zb.files if k.startswith("params/"))
    # Same tolerance class as the sharded-vs-single contract
    # (tests/test_trainer.py): gradient-FREE params (the fc1 biases, whose
    # effect BatchNorm's mean subtraction cancels exactly) integrate pure
    # f32 rounding noise through Adam — each optimizer step moves them by
    # up to ~lr in a topology-dependent direction, so cross-process runs
    # drift a few 1e-3 on those elements (observed max 1.5e-3 after the
    # masked tail step joined the mesh path in r4; 2.3e-5 before). Bound:
    # the 5e-3 max + count-of-large-elements shape used there.
    n_viol = n_tot = 0
    for k in keys_a:
        diff = np.abs(za[k] - zb[k])
        assert diff.max() < 5e-3, f"{k}: {diff.max():.2e}"
        n_viol += int((diff > 1e-4).sum())
        n_tot += diff.size
    assert n_viol <= max(1, 5 * n_tot // 1000), f"{n_viol}/{n_tot} beyond 1e-4"

    # ---- DEC stage (p3): kmeans center init from gathered latents, KL
    # training, delta stopping — each process initializes centers from its
    # own identical gathered latents (replicated local compute, no
    # collectives) and the joint training runs over the global mesh
    p3_args = [
        "--batch_size", "16", "--num_timestamps", "16", "--max_epochs", "2",
        "--data_parallel", "-1", "--early_stopping", "100",
        "--cluster_number", "3", "--kmeans_n_init", "3",
    ] + cache_args
    _wait(_run(("p3", p3_args + ["--results_path", "Results_single"]),
               str(tmp_path), 8))
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(_run(
            ("p3", p3_args + [
                "--results_path", "Results_multi",
                "--num_processes", "2", "--process_id", str(pid),
                "--coordinator_address", f"127.0.0.1:{port}",
            ]),
            str(tmp_path), 4,
        ))
    for p in procs:
        _wait(p)

    for cohort in ("training", "testing"):
        a = np.load(
            tmp_path / "Results_single" / "Clustering" / "out_feat" / "delta"
            / f"{cohort}.npy", allow_pickle=True,
        ).item()
        b = np.load(
            tmp_path / "Results_multi" / "Clustering" / "out_feat" / "delta"
            / f"{cohort}.npy", allow_pickle=True,
        ).item()
        np.testing.assert_allclose(a["hidden"], b["hidden"], atol=1e-4)
        # the DEC argmax labels must agree exactly (soft assignments are
        # well-separated after 2 epochs at this scale; any flip would mean
        # a real divergence, not noise)
        np.testing.assert_array_equal(
            np.argmax(a["cluster_pred"], axis=1),
            np.argmax(b["cluster_pred"], axis=1),
        )
