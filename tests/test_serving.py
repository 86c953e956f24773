"""Production serving stack (protnote_tpu/serving.py + cli/serve.py): the
engine's latents fast path matches the direct forward, micro-batching
coalesces concurrent requests correctly, and the stdlib HTTP server answers
end-to-end.  The reference has no serving surface (its inference entry
points are batch eval drivers, bin/main.py)."""

import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protnote_tpu.models.fusion import ProtNoteConfig, init_protnote, protnote_forward
from protnote_tpu.models.proteinfer import ProteInferConfig, embed_from_ids, init_proteinfer
from protnote_tpu.serving import MicroBatcher, ServingEngine, make_http_server
from protnote_tpu.train.optim import make_optimizer
from protnote_tpu.train.step import init_train_state

AAS = "ACDEFGHIKLMNPQRSTVWY"
L, K, D = 7, 2, 16


def _make_engine(backend="auto", max_batch=4, buckets=(32, 64), seed=0,
                 matrix_seed=None, mesh=None):
    PI = ProteInferConfig(output_channels=24, kernel_size=5,
                          num_resnet_blocks=1, num_labels=L)
    PN = ProtNoteConfig(protein_embedding_dim=24, label_embedding_dim=D,
                        latent_dim=8, projection_head_num_layers=2,
                        projection_head_hidden_dim_scale_factor=2,
                        output_mlp_num_layers=2,
                        output_mlp_hidden_dim_scale_factor=2,
                        label_tile=4, inference_descriptions_per_label=K,
                        pair_backend=backend)
    pi_p, pi_s = init_proteinfer(jax.random.PRNGKey(seed), PI)
    pn_p, pn_s = init_protnote(jax.random.PRNGKey(seed + 1), PN)
    tx = make_optimizer({"OPTIMIZER": "Adam", "LEARNING_RATE": 1e-3})
    ts = init_train_state(pn_p, pn_s, pi_p, pi_s, tx)
    rng = np.random.default_rng(seed if matrix_seed is None else matrix_seed)
    matrix = rng.normal(size=(L * K, D)).astype(np.float32)
    vocab = [f"GO:{i:07d}" for i in range(L)]
    return ServingEngine(ts, PI, PN, matrix, vocab, buckets=buckets,
                         max_batch=max_batch, mesh=mesh), matrix


def _seqs(rng, n, lo=10, hi=50):
    return ["".join(rng.choice(list(AAS), int(rng.integers(lo, hi))))
            for _ in range(n)]


def test_engine_matches_direct_forward(rng):
    """The serving path (precomputed latents, bucket padding, batching)
    reproduces a direct embed+forward on the raw label embeddings."""
    engine, matrix = _make_engine()
    seqs = _seqs(rng, 3, lo=10, hi=30)
    probs = engine.score(seqs)
    assert probs.shape == (3, L)
    assert np.all((probs > 0) & (probs < 1))

    # direct reference: same padded shapes, label tower run from embeddings
    bucket = 32
    aa = np.full((len(seqs), bucket), engine._pad_id, np.int8)
    lengths = np.zeros(len(seqs), np.int32)
    for r, s in enumerate(seqs):
        ids = engine._encode([s])[0]
        aa[r, : len(ids)] = ids
        lengths[r] = len(ids)
    P_f, _ = embed_from_ids(
        engine.ts["enc_params"], engine.ts["enc_state"],
        jnp.asarray(aa), jnp.asarray(lengths), engine.pi_cfg,
    )
    logits, _ = protnote_forward(
        engine.ts["trainable"]["protnote"], engine.ts["model_state"],
        P_f, jnp.asarray(matrix), engine.pn_cfg, train=False,
    )
    want = 1 / (1 + np.exp(-np.asarray(logits, np.float64)))
    # serving reads logits back in f16 (the repo's export dtype):
    # probability error bounded by sigmoid'(x) * f16-rounding ~ 5e-4
    np.testing.assert_allclose(probs, want, atol=2e-3)


def test_engine_bucket_order_invariance(rng):
    """Scores are independent of request order, co-batching, and bucket
    assignment; overflow sequences truncate to the largest bucket."""
    engine, _ = _make_engine(max_batch=3)
    seqs = _seqs(rng, 7, lo=5, hi=60)  # spans both buckets, splits batches
    probs = engine.score(seqs)
    perm = rng.permutation(len(seqs))
    probs_perm = engine.score([seqs[i] for i in perm])
    np.testing.assert_allclose(probs_perm, probs[perm], atol=1e-6)
    one_by_one = np.concatenate([engine.score([s]) for s in seqs])
    np.testing.assert_allclose(one_by_one, probs, atol=1e-6)

    long_seq = "".join(rng.choice(list(AAS), 200))  # > largest bucket (64)
    np.testing.assert_allclose(
        engine.score([long_seq]), engine.score([long_seq[:64]]), atol=1e-6
    )


def test_engine_rejects_empty_sequence(rng):
    engine, _ = _make_engine()
    with pytest.raises(ValueError, match="empty"):
        engine.score(["ACDE", ""])


def test_top_k_sorted_and_thresholded(rng):
    engine, _ = _make_engine()
    seqs = _seqs(rng, 2)
    probs = engine.score(seqs)
    top = engine.top_k(seqs, k=3)
    for row, pairs in zip(probs, top):
        assert len(pairs) == 3
        ps = [p for _, p in pairs]
        assert ps == sorted(ps, reverse=True)
        assert ps[0] == pytest.approx(float(row.max()), abs=1e-6)
    # threshold filters
    thr = float(np.median(probs))
    top_t = engine.top_k(seqs, k=L, threshold=thr)
    for row, pairs in zip(probs, top_t):
        assert len(pairs) == int((row >= thr).sum())


def test_int8_backend_lazy_calibration(rng):
    """PAIR_BACKEND=tiled_int8 without scales: the first scored batch
    calibrates static activation scales; probabilities stay close to the
    exact path."""
    engine8, _ = _make_engine(backend="tiled_int8")
    engine, _ = _make_engine(backend="auto")
    assert engine8._needs_calibration
    seqs = _seqs(rng, 4, lo=10, hi=30)
    p8 = engine8.score(seqs)
    assert not engine8._needs_calibration
    assert engine8.pn_cfg.int8_act_scales is not None
    exact = engine.score(seqs)
    assert np.max(np.abs(p8 - exact)) < 3e-2
    # and the int8 path genuinely ran: quantization noise must separate it
    # from the exact path (a silent fallback to the float kernels would
    # make every other assertion here pass vacuously)
    assert np.max(np.abs(p8 - exact)) > 1e-6


def test_micro_batcher_coalesces_concurrent_requests(rng):
    engine, _ = _make_engine()
    score_calls = []
    orig_score = engine.score
    engine.score = lambda s: (score_calls.append(len(s)), orig_score(s))[1]
    # one worker + a generous straggler window: all 5 concurrent requests
    # land in ONE worker batch (deterministic coalescing evidence — the
    # request counter alone would pass even with coalescing disabled)
    mb = MicroBatcher(engine, max_wait_ms=500.0, pipeline_depth=1,
                      max_batch=16)
    try:
        seqs = [_seqs(rng, int(rng.integers(1, 3))) for _ in range(5)]
        want = [orig_score(s) for s in seqs]
        n_before = len(score_calls)
        got = [None] * len(seqs)

        def run(i):
            got[i] = mb.submit(seqs[i])

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(seqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=1e-6)
        assert engine.stats.requests == len(seqs)
        # coalescing: 5 requests dispatched in FEWER worker score calls
        assert len(score_calls) - n_before < len(seqs)
    finally:
        mb.close()
        engine.score = orig_score

    # errors propagate to the caller without killing the worker
    mb2 = MicroBatcher(engine, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="empty"):
            mb2.submit([""])
        assert mb2.submit(["ACDE"]).shape == (1, L)
    finally:
        mb2.close()
    # closed batcher rejects instead of hanging
    with pytest.raises(RuntimeError, match="closed"):
        mb2.submit(["ACDE"])


def test_micro_batcher_bad_request_does_not_poison_cobatch(rng):
    """A malformed request fails in ITS caller's thread (validated before
    enqueue) — a concurrently co-batched valid request must succeed."""
    engine, _ = _make_engine()
    mb = MicroBatcher(engine, max_wait_ms=500.0)
    try:
        good_seqs = _seqs(rng, 2)
        want = engine.score(good_seqs)
        results = {}

        def good():
            results["good"] = mb.submit(good_seqs)

        def bad():
            try:
                mb.submit(["ACDE", ""])
            except ValueError as e:
                results["bad"] = e

        tg, tb = threading.Thread(target=good), threading.Thread(target=bad)
        tg.start(); tb.start()
        tg.join(timeout=30); tb.join(timeout=30)
        assert isinstance(results["bad"], ValueError)
        np.testing.assert_allclose(results["good"], want, atol=1e-6)
    finally:
        mb.close()


def test_warmup_refuses_synthetic_int8_calibration(rng):
    """warmup() must NOT freeze int8 scales from its synthetic motif;
    calibrate_from(real sequences) unblocks it."""
    engine8, _ = _make_engine(backend="tiled_int8")
    assert engine8._needs_calibration
    engine8.warmup()  # skipped with a warning
    assert engine8._needs_calibration
    assert engine8.pn_cfg.int8_act_scales is None
    real = _seqs(rng, 4, lo=10, hi=30)
    engine8.calibrate_from(real)
    assert not engine8._needs_calibration
    engine8.warmup()  # now compiles every bucket
    probs = engine8.score(real)
    assert probs.shape == (4, L)


def test_engine_drops_optimizer_state(rng):
    """Serving never reads the optimizer state: it must not be pinned on
    the serving devices (Adam mu/nu ~ 2 extra copies of the trainables)."""
    engine, _ = _make_engine()
    assert "opt_state" not in engine.ts
    assert "step" not in engine.ts


def test_mesh_sharded_int8_serving(rng):
    """Label-sharded mesh x int8 static scales: lazy calibration runs its
    jit with a replicated output over the mesh, and sharded probabilities
    match the single-device int8 engine."""
    from protnote_tpu.parallel.mesh import MeshSpec, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    single8, _ = _make_engine(backend="tiled_int8")
    mesh = make_mesh(MeshSpec(dp=1, label=8))
    sharded8, _ = _make_engine(backend="tiled_int8", mesh=mesh)
    assert sharded8._needs_calibration

    seqs = _seqs(rng, 4, lo=10, hi=40)
    p_sharded = sharded8.score(seqs)
    assert not sharded8._needs_calibration
    p_single = single8.score(seqs)
    # both calibrated on the same first batch of the same weights
    np.testing.assert_allclose(
        np.asarray(sharded8.pn_cfg.int8_act_scales),
        np.asarray(single8.pn_cfg.int8_act_scales), rtol=1e-3,
    )
    np.testing.assert_allclose(p_sharded, p_single, atol=5e-3)


def test_hot_reload_swaps_weights(rng):
    """engine.reload(new ts): scores change to the new model's, atomically;
    a failed reload rolls back to the old weights."""
    engine, _ = _make_engine(seed=0)
    # different weights, SAME label matrix (reload swaps weights only)
    other, _ = _make_engine(seed=7, matrix_seed=0)
    seqs = _seqs(rng, 3)
    before = engine.score(seqs)
    want_after = other.score(seqs)

    engine.reload(other.ts)
    after = engine.score(seqs)
    np.testing.assert_allclose(after, want_after, atol=1e-6)
    assert np.max(np.abs(after - before)) > 1e-4  # genuinely different


def test_http_metrics_and_reload_endpoints(rng, tmp_path):
    engine, _ = _make_engine(seed=0)
    other, _ = _make_engine(seed=9, matrix_seed=0)
    reloaded = []

    def reload_fn(path):
        # emulate cli.serve's reload_fn without a Trainer: restore is
        # covered elsewhere; here the wiring + atomic swap is the subject
        if not path.endswith(".ckpt"):
            raise FileNotFoundError(path)
        engine.reload(other.ts)
        reloaded.append(path)

    server, batcher = make_http_server(engine, port=0, reload_fn=reload_fn)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        seqs = _seqs(rng, 2)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict",
            data=json.dumps({"sequences": seqs, "top_k": 2}).encode(),
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            r.read()
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=30
        ) as r:
            text = r.read().decode()
        assert "protnote_requests_total 1" in text
        assert f"protnote_labels {L}" in text
        assert "protnote_device_seconds_total" in text

        rl = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/reload",
            data=json.dumps({"model_file": "new.ckpt"}).encode(),
        )
        with urllib.request.urlopen(rl, timeout=30) as r:
            assert json.loads(r.read())["status"] == "reloaded"
        assert reloaded == ["new.ckpt"]
        # post-reload predictions come from the new weights
        probs = batcher.submit(seqs)
        np.testing.assert_allclose(probs, other.score(seqs), atol=1e-6)

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/reload",
            data=json.dumps({"model_file": "missing.nope"}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        batcher.close()
        server.server_close()
        t.join(timeout=10)


def test_resolve_label_mesh_extents(rng):
    """--mesh-label N uses the FIRST N devices (previously any N < device
    count crashed MeshSpec.resolve); 1 forces single-device."""
    import logging

    from protnote_tpu.cli._model_setup import resolve_label_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    log = logging.getLogger("test")
    mesh = resolve_label_mesh(4, {}, log)
    assert mesh is not None and int(mesh.shape["label"]) == 4
    assert resolve_label_mesh(1, {"MESH_LABEL": 8}, log) is None  # explicit 1 wins
    assert int(resolve_label_mesh(None, {}, log).shape["label"]) == 8  # default: all
    with pytest.raises(ValueError, match="attached devices"):
        resolve_label_mesh(99, {}, log)


def test_http_server_end_to_end(rng):
    engine, _ = _make_engine()
    server, batcher = make_http_server(engine, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        seqs = _seqs(rng, 3)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict",
            data=json.dumps({"sequences": seqs, "top_k": 2}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            body = json.loads(r.read())
        preds = body["predictions"]
        assert len(preds) == 3 and all(len(p) == 2 for p in preds)
        want = engine.top_k(seqs, k=2)
        for p, w in zip(preds, want):
            assert [x[0] for x in p] == [x[0] for x in w]
            np.testing.assert_allclose([x[1] for x in p], [x[1] for x in w],
                                       atol=1e-6)

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["labels"] == L
        assert health["requests"] >= 1

        # bad request -> 400 with an error message
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict",
            data=json.dumps({"sequences": []}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        batcher.close()
        server.server_close()
        t.join(timeout=10)


def test_mesh_sharded_serving_matches_single_device(rng):
    """Label-axis-sharded serving (pod layout, dp=1 x label=8): identical
    probabilities to the single-device engine, including a vocabulary (7)
    that does NOT divide the label axis (padded to 8, padding dropped)."""
    from protnote_tpu.parallel.mesh import MeshSpec, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    engine, _ = _make_engine()
    mesh = make_mesh(MeshSpec(dp=1, label=8))
    sharded, _ = _make_engine(mesh=mesh)
    assert sharded._num_labels_padded == 8  # 7 labels pad to the axis

    seqs = _seqs(rng, 5, lo=10, hi=50)
    np.testing.assert_allclose(
        sharded.score(seqs), engine.score(seqs), atol=2e-3
    )
    top = sharded.top_k(seqs, k=3)
    assert all(len(p) == 3 for p in top)
    # padded label ids never leak into results
    assert all(g in sharded.label_vocabulary for p in top for g, _ in p)


def test_serve_cli_build_engine(tmp_path, rng):
    """cli/serve.py builds a working engine from the on-disk config + label
    cache layout (same contract as cli/predict.py)."""
    from protnote_tpu.data.label_cache import LabelEmbeddingCache
    from protnote_tpu.models.label_encoder import HashLabelEncoder

    (tmp_path / "data" / "embeddings").mkdir(parents=True)
    (tmp_path / "outputs").mkdir()
    labels = [f"GO:{i:07d}" for i in range(6)]
    enc = HashLabelEncoder(dim=16)
    ids, dts, txts = [], [], []
    for g in labels:
        for dt in ("name", "label"):
            ids.append(g), dts.append(dt), txts.append(f"{dt} {g}")
    emb = enc.embed(txts)
    LabelEmbeddingCache.save(
        str(tmp_path / "data" / "embeddings"
            / "frozen_label_embeddings_E5multilingual_mean.npz"),
        emb, ids, dts, txts, enc.token_counts(txts),
    )
    old = dict(os.environ)
    os.environ["PROTNOTE_DATA_DIR"] = str(tmp_path / "data")
    os.environ["PROTNOTE_OUTPUT_DIR"] = str(tmp_path / "outputs")
    try:
        from protnote_tpu.cli.serve import build_argparser, build_engine

        args = build_argparser().parse_args([
            "--max-batch", "4",
            "--override",
            "OUTPUT_CHANNELS", "32", "KERNEL_SIZE", "5",
            "NUM_RESNET_BLOCKS", "1", "PROTEINFER_NUM_GO_LABELS", "6",
            "LABEL_EMBEDDING_DIM", "16", "LATENT_EMBEDDING_DIM", "8",
            "PROJECTION_HEAD_NUM_LAYERS", "2", "OUTPUT_MLP_NUM_LAYERS", "2",
            "OUTPUT_MLP_HIDDEN_DIM_SCALE_FACTOR", "2",
            "PROJECTION_HEAD_HIDDEN_DIM_SCALE_FACTOR", "2",
            "MIXED_PRECISION", "False", "SEQUENCE_BUCKETS", "[64]",
        ])
        engine, trainer = build_engine(args)
        assert engine.label_vocabulary == labels
        probs = engine.score(["ACDEFGHIKL", "MNPQRSTVWY"])
        assert probs.shape == (2, 6)
        assert np.all(np.isfinite(probs))
    finally:
        os.environ.clear()
        os.environ.update(old)
