"""M6/M7 sequence-model path: Spark staging tested everywhere; the
torch loop itself is exercised only where torch exists (skip-marked —
this container has no torch; the scaffold is the documented capability
path for torch-equipped clusters)."""

import os

import pytest
from pyspark.sql import functions as F

from hive_population_ml_spark.ml.sequence import (
    SequenceModelSpec,
    stage_sequences,
    staged_summary,
    train_sequence_model,
)
from hive_population_ml_spark.operators.sequences import build_sequences

try:
    import torch  # noqa: F401

    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False


def _staged(spark, tmp_path, num_shards=2):
    rows = [
        (k, t, float(k + t), float(t % 3))
        for k in range(20)
        for t in range(5 + k % 4)
    ]
    df = spark.createDataFrame(rows, "key int, ts int, v1 double, v2 double")
    seqs = build_sequences(
        df, ["key"], "ts", ["v1", "v2"], max_len=6, pad_to=6
    )
    labels = spark.createDataFrame(
        [(k, float(k) * 0.5) for k in range(20)], "key int, y double"
    )
    path = os.path.join(tmp_path, "staged")
    stage_sequences(seqs, labels, ["key"], "y", path, num_shards=num_shards)
    return path


def test_stage_sequences_shapes_and_shards(spark, tmp_path):
    path = _staged(spark, tmp_path, num_shards=3)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 3  # one shard per torch worker
    s = staged_summary(spark, path)
    assert s["rows"] == 20
    assert s["distinct_padded_lens"] == 1  # every seq padded to the same len
    assert s["padded_len"] == 6 and s["num_features"] == 2
    assert s["max_seq_len"] <= 6
    # labels joined, no row lost/duplicated
    df = spark.read.parquet(path)
    assert df.select("key").distinct().count() == 20
    assert df.filter(F.col("label").isNull()).count() == 0


def test_train_without_torch_raises_clear_error(spark, tmp_path):
    if HAS_TORCH:
        pytest.skip("torch present; covered by the training tests below")
    path = _staged(spark, tmp_path)
    with pytest.raises(ImportError, match="TorchDistributor"):
        train_sequence_model(
            spark, path, SequenceModelSpec(), os.path.join(tmp_path, "m.pt"),
            backend="torch",
        )


# --------------------------------------------------------------------------
# Numpy evidence backend: the M6/M7 training path EXECUTES in-container.
# Same architectures, same loop semantics, same shard reader as the torch
# path (ml/sequence.py::load_staged_shard).
# --------------------------------------------------------------------------


def test_load_staged_shard_tensor_contract(spark, tmp_path):
    from hive_population_ml_spark.ml.sequence import load_staged_shard

    path = _staged(spark, tmp_path, num_shards=2)
    x0, m0, y0 = load_staged_shard(path, rank=0, world=2)
    x1, m1, y1 = load_staged_shard(path, rank=1, world=2)
    assert x0.shape[0] + x1.shape[0] == 20
    for x, m, y in [(x0, m0, y0), (x1, m1, y1)]:
        assert x.dtype.name == "float32" and x.ndim == 3
        assert x.shape[1] == 6 and x.shape[2] == 2  # padded_len, num_features
        assert m.shape == x.shape[:2] and m.dtype.name == "bool"
        assert m[:, 0].all()  # every sequence has >=1 valid timestep
        assert y.shape == (x.shape[0],)
    # padding zeros exactly where mask is False
    import numpy as np

    assert np.all(x0[~m0] == 0.0)


def test_load_staged_shard_rejects_world_gt_shards(spark, tmp_path):
    from hive_population_ml_spark.ml.sequence import load_staged_shard

    path = _staged(spark, tmp_path, num_shards=2)
    with pytest.raises(ValueError, match="shard count 2 < world size 4"):
        load_staged_shard(path, rank=3, world=4)


def test_load_staged_shard_rejects_empty_shard(spark, tmp_path):
    """ADVICE r3: a shard file that EXISTS but holds zero rows slipped
    past the missing-file guard and would hit ZeroDivisionError in the
    DDP batch-count padding (reps = -(-need // n), n == 0)."""
    import pyarrow.parquet as pq

    from hive_population_ml_spark.ml.sequence import load_staged_shard

    path = _staged(spark, tmp_path, num_shards=2)
    files = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    victim = os.path.join(path, files[1])
    schema = pq.read_schema(victim)
    pq.write_table(schema.empty_table(), victim)
    with pytest.raises(ValueError, match="zero\\s+rows"):
        load_staged_shard(path, rank=1, world=2)
    # the other rank still loads fine
    x, m, y = load_staged_shard(path, rank=0, world=2)
    assert x.shape[0] > 0


def _torch_doc_forward(m, x, mask):
    """Independent plain-numpy transcription of the TORCH-DOCUMENTED
    equations (nn.Linear, nn.LayerNorm, nn.LSTM [i,f,g,o], nn.GRU v3
    gating n = tanh(x Wxn + b_in + r*(h Whn + b_hn)), attention/mean
    pooling) — no autodiff graph, written from the docs rather than
    from sequence_numpy.py. Agreement pins the twin to the torch
    weight/dynamics convention, which is the cross-backend contract a
    torch host would otherwise check (reference trainer.py:262-320)."""
    import numpy as np

    spec = m.spec
    d = spec.hidden_dim

    def sig(a):
        return 1.0 / (1.0 + np.exp(-a))

    h = x @ m.proj_w.v + m.proj_b.v
    mu = h.mean(-1, keepdims=True)
    var = ((h - mu) ** 2).mean(-1, keepdims=True)
    h = m.proj_gamma.v * (h - mu) / np.sqrt(var + 1e-5) + m.proj_beta.v

    B, Tlen, _ = h.shape
    xl = h
    for row in m.cells:
        outs_dir = []
        for di, cell in enumerate(row):
            order = range(Tlen) if di == 0 else range(Tlen - 1, -1, -1)
            hs = np.zeros((B, d))
            cs = np.zeros((B, d))
            out = np.zeros((B, Tlen, d))
            for t in order:
                xt = xl[:, t, :]
                if spec.model == "lstm":
                    wx, wh, b = cell
                    pre = xt @ wx.v + hs @ wh.v + b.v
                    i = sig(pre[:, 0 * d : 1 * d])
                    f = sig(pre[:, 1 * d : 2 * d])
                    g = np.tanh(pre[:, 2 * d : 3 * d])
                    o = sig(pre[:, 3 * d : 4 * d])
                    cs = f * cs + i * g
                    hs = o * np.tanh(cs)
                else:
                    wx, wh, b, bh = cell
                    gi = xt @ wx.v + b.v
                    gh = hs @ wh.v + bh.v
                    r = sig(gi[:, :d] + gh[:, :d])
                    z = sig(gi[:, d : 2 * d] + gh[:, d : 2 * d])
                    n = np.tanh(gi[:, 2 * d :] + r * gh[:, 2 * d :])
                    hs = (1.0 - z) * n + z * hs
                out[:, t, :] = hs
            outs_dir.append(out)
        xl = outs_dir[0] if len(outs_dir) == 1 else np.concatenate(outs_dir, -1)

    if spec.use_attention:
        s = np.tanh(xl @ m.attn1[0].v + m.attn1[1].v) @ m.attn2[0].v + m.attn2[1].v
        s = s[..., 0] + np.where(mask, 0.0, -1e30)
        s = s - s.max(-1, keepdims=True)
        e = np.exp(s)
        w = e / e.sum(-1, keepdims=True)
        pooled = (w[..., None] * xl).sum(1)
    else:
        mm = mask[..., None].astype(np.float64)
        pooled = (xl * mm).sum(1) / np.maximum(mm.sum(1), 1.0)
    out = pooled @ m.head_w.v + m.head_b.v
    return out[..., 0] if spec.num_classes == 1 else out


@pytest.mark.parametrize("model", ["lstm", "gru"])
def test_numpy_twin_matches_torch_documented_equations(model):
    """Cross-backend contract (VERDICT r3 #3, torch uninstallable here):
    the autodiff twin's forward must agree elementwise with an
    independent direct transcription of torch's documented recurrences —
    with every parameter (biases included) randomized so bias PLACEMENT
    matters: the pre-fix GRU variant (fused bias, reset applied before
    the hidden matmul) fails this at any nonzero b_hn."""
    import numpy as np

    from hive_population_ml_spark.ml.sequence_numpy import NumpySeqModel

    spec = SequenceModelSpec(
        model=model,
        hidden_dim=5,
        num_layers=2,
        bidirectional=True,
        use_attention=True,
        dropout=0.0,
        num_classes=1,
        seed=11,
    )
    m = NumpySeqModel(spec, num_features=3)
    rng = np.random.default_rng(99)
    for p in m.params:  # nonzero biases everywhere
        p.v = rng.normal(0.0, 0.5, size=p.v.shape)
    x = rng.normal(size=(4, 6, 3))
    mask = np.arange(6)[None, :] < np.array([6, 4, 2, 5])[:, None]

    got = m.forward(x, mask, training=False).v
    want = _torch_doc_forward(m, x, mask)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_ddp_early_stop_sync_semantics():
    """The DDP loop's global early-stop decision (sequence.py::_train_fn
    all-reduces the epoch loss to the global mean before the patience
    test), executed via the shared PatienceTracker in a multi-rank
    lockstep simulation: rank-LOCAL decisions diverge on these loss
    traces (the deadlock the allreduce prevents); the synced decision
    is identical on every rank at every epoch."""
    from hive_population_ml_spark.ml.sequence import PatienceTracker

    rank_losses = [
        [1.0, 0.9, 0.95, 0.96, 0.97],  # improves early, then stalls
        [1.0, 1.01, 0.7, 0.71, 0.72],  # stalls, then improves
    ]
    patience = 2

    def stop_epoch(losses):
        t = PatienceTracker(patience)
        for e, loss in enumerate(losses):
            if t.update(loss)[1]:
                return e
        return None

    local_stops = [stop_epoch(ls) for ls in rank_losses]
    assert len(set(local_stops)) > 1, "traces must expose the divergence"

    trackers = [PatienceTracker(patience) for _ in rank_losses]
    stopped_at = None
    for e in range(len(rank_losses[0])):
        g = sum(ls[e] for ls in rank_losses) / len(rank_losses)  # allreduce
        decisions = {t.update(g)[1] for t in trackers}
        assert len(decisions) == 1, "ranks disagreed on the same input"
        if decisions.pop():
            stopped_at = e
            break
    assert stopped_at == 4  # both trackers stop together


@pytest.mark.parametrize("model", ["lstm", "gru", "transformer"])
def test_numpy_backend_trains_and_loss_decreases(spark, tmp_path, model):
    path = _staged(spark, tmp_path, num_shards=1)
    spec = SequenceModelSpec(
        model=model, hidden_dim=8, num_layers=2, max_epochs=10,
        batch_size=16, num_heads=2, lr=1e-2,
    )
    out = os.path.join(tmp_path, f"{model}.npz")
    res = train_sequence_model(spark, path, spec, out, backend="numpy")
    assert res["backend"] == "numpy"
    assert res["epochs_run"] >= 1
    # real learning, not a smoke: loss must drop by >30% over 10 epochs
    hist = res["loss_history"]
    assert hist[-1] < hist[0] * 0.7, hist
    assert res["final_loss"] == min(hist)
    assert os.path.exists(out)


def test_numpy_backend_classification_head(spark, tmp_path):
    rows = [
        (k, t, float(k + t), float(t % 3))
        for k in range(20)
        for t in range(5 + k % 4)
    ]
    df = spark.createDataFrame(rows, "key int, ts int, v1 double, v2 double")
    seqs = build_sequences(df, ["key"], "ts", ["v1", "v2"], max_len=6, pad_to=6)
    # class = coarse magnitude bucket of the key — linearly separable from
    # the sequence mean, so a tiny model must be able to learn it
    labels = spark.createDataFrame(
        [(k, float(0 if k < 7 else (1 if k < 14 else 2))) for k in range(20)],
        "key int, y double",
    )
    path = os.path.join(tmp_path, "staged_cls")
    stage_sequences(seqs, labels, ["key"], "y", path, num_shards=1)
    spec = SequenceModelSpec(
        model="gru", hidden_dim=8, num_layers=1, max_epochs=6,
        batch_size=16, lr=1e-2, task_type="classification", num_classes=3,
        use_attention=False, bidirectional=False,
    )
    out = os.path.join(tmp_path, "cls.npz")
    res = train_sequence_model(spark, path, spec, out, backend="numpy")
    hist = res["loss_history"]
    assert hist[-1] < hist[0]  # cross-entropy decreases


def test_numpy_backend_deterministic_by_seed(spark, tmp_path):
    path = _staged(spark, tmp_path, num_shards=1)
    spec = SequenceModelSpec(
        model="gru", hidden_dim=8, num_layers=1, max_epochs=3,
        batch_size=16, lr=1e-2,
    )
    r1 = train_sequence_model(
        spark, path, spec, os.path.join(tmp_path, "a.npz"), backend="numpy"
    )
    r2 = train_sequence_model(
        spark, path, spec, os.path.join(tmp_path, "b.npz"), backend="numpy"
    )
    assert r1["loss_history"] == r2["loss_history"]


def test_auto_backend_resolves_here(spark, tmp_path):
    path = _staged(spark, tmp_path, num_shards=1)
    spec = SequenceModelSpec(
        model="gru", hidden_dim=4, num_layers=1, max_epochs=1, batch_size=16
    )
    res = train_sequence_model(
        spark, path, spec, os.path.join(tmp_path, "m.bin")
    )
    assert res["backend"] == ("torch" if HAS_TORCH else "numpy")


def test_numpy_backend_rejects_multiprocess(spark, tmp_path):
    path = _staged(spark, tmp_path, num_shards=2)
    with pytest.raises(ValueError, match="single-process"):
        train_sequence_model(
            spark, path, SequenceModelSpec(), os.path.join(tmp_path, "m.npz"),
            num_processes=2, backend="numpy",
        )


@pytest.mark.parametrize("model", ["lstm", "gru", "transformer"])
def test_numpy_autodiff_matches_finite_differences(model):
    """The evidence backend's gradients are exact: central finite
    differences agree to ~1e-6 on the largest-gradient entries of every
    parameter tensor (checked at dropout=0 for determinism)."""
    import numpy as np

    from hive_population_ml_spark.ml.sequence_numpy import (
        NumpySeqModel,
        backward,
        mse_loss,
    )

    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 4, 3))
    mask = np.array(
        [[1, 1, 1, 0], [1, 1, 0, 0], [1, 1, 1, 1], [1, 0, 0, 0], [1, 1, 1, 0]],
        bool,
    )
    y = rng.normal(size=5)
    spec = SequenceModelSpec(
        model=model, hidden_dim=4, num_layers=2, num_heads=2, dropout=0.0, seed=7
    )
    m = NumpySeqModel(spec, 3)
    loss = mse_loss(m.forward(x, mask, training=False), y)
    backward(loss)
    for p in m.params:
        g = (p.g if p.g is not None else np.zeros_like(p.v)).reshape(-1)
        flat = p.v.reshape(-1)
        j = int(np.argmax(np.abs(g)))
        if abs(g[j]) < 1e-5:
            continue
        eps = 1e-5
        old = flat[j]
        flat[j] = old + eps
        lp = float(mse_loss(m.forward(x, mask, training=False), y).v)
        flat[j] = old - eps
        lm = float(mse_loss(m.forward(x, mask, training=False), y).v)
        flat[j] = old
        fd = (lp - lm) / (2 * eps)
        assert abs(fd - g[j]) / max(abs(fd), abs(g[j])) < 1e-5


@pytest.mark.skipif(not HAS_TORCH, reason="torch not installed in this runtime")
@pytest.mark.parametrize("model", ["lstm", "gru", "transformer"])
def test_sequence_model_one_epoch(spark, tmp_path, model):
    path = _staged(spark, tmp_path, num_shards=1)
    spec = SequenceModelSpec(
        model=model, hidden_dim=8, num_layers=1, max_epochs=1,
        batch_size=8, num_heads=2,
    )
    out = os.path.join(tmp_path, "m.pt")
    res = train_sequence_model(spark, path, spec, out)
    assert res["epochs_run"] == 1 and res["final_loss"] >= 0.0
    assert os.path.exists(out)
