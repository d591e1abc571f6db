"""Numpy reference backend for the M6/M7 sequence models.

This container has no torch, so the TorchDistributor path in
``ml/sequence.py`` cannot execute here. To keep the training path
*executable evidence* rather than trust-me scaffolding, this module
re-implements the exact same architectures — input projection →
(bi)LSTM/GRU or Transformer encoder → attention/mean pooling → task
head (reference ``src/models/lstm.py:14-440``,
``src/models/transformer.py:16-529``) — on a minimal reverse-mode
autodiff over numpy, and runs the identical training loop (Adam, seeded
shuffling, patience early stopping; reference
``src/training/trainer.py:262-320``).

It shares :func:`~.sequence.load_staged_shard` with the torch path, so
the staged-shard → tensor contract validated by these tests is the very
code the torch workers run. Gate conventions follow torch exactly —
LSTM [i,f,g,o] order with fused (weight-equivalent) bias, GRU v3
gating with a separate hidden bias inside the reset gate — pinned by
``tests/test_sequence_models.py::
test_numpy_twin_matches_torch_documented_equations`` against an
independent transcription of the documented recurrences. This is a correctness/evidence backend, not
a performance path: at cluster scale the torch backend does the
training; this one proves the semantics in any plain numpy environment.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# minimal reverse-mode autodiff
# --------------------------------------------------------------------------


class T:
    """A tensor node: value, gradient, and a backward closure."""

    __slots__ = ("v", "g", "parents", "bw")

    def __init__(self, v, parents=(), bw=None):
        self.v = np.asarray(v, dtype=np.float64)
        self.g = None
        self.parents = parents
        self.bw = bw  # callable(g_out) -> grads aligned with parents


def _unbroadcast(g, shape):
    """Sum gradient ``g`` back down to ``shape`` after numpy broadcasting."""
    while g.ndim > len(shape):
        g = g.sum(axis=0)
    for i, s in enumerate(shape):
        if s == 1 and g.shape[i] != 1:
            g = g.sum(axis=i, keepdims=True)
    return g.reshape(shape)


def add(a: T, b: T) -> T:
    return T(
        a.v + b.v,
        (a, b),
        lambda g: (_unbroadcast(g, a.v.shape), _unbroadcast(g, b.v.shape)),
    )


def mul(a: T, b: T) -> T:
    return T(
        a.v * b.v,
        (a, b),
        lambda g: (
            _unbroadcast(g * b.v, a.v.shape),
            _unbroadcast(g * a.v, b.v.shape),
        ),
    )


def cmul(a: T, c) -> T:
    """Multiply by a plain ndarray/scalar constant (no grad through c)."""
    c = np.asarray(c, dtype=np.float64)
    return T(a.v * c, (a,), lambda g: (_unbroadcast(g * c, a.v.shape),))


def cadd(a: T, c) -> T:
    c = np.asarray(c, dtype=np.float64)
    return T(a.v + c, (a,), lambda g: (_unbroadcast(g, a.v.shape),))


def matmul(a: T, b: T) -> T:
    out = a.v @ b.v

    def bw(g):
        ga = g @ np.swapaxes(b.v, -1, -2)
        gb = np.swapaxes(a.v, -1, -2) @ g
        return _unbroadcast(ga, a.v.shape), _unbroadcast(gb, b.v.shape)

    return T(out, (a, b), bw)


def tanh(a: T) -> T:
    out = np.tanh(a.v)
    return T(out, (a,), lambda g: (g * (1.0 - out * out),))


def sigmoid(a: T) -> T:
    out = 1.0 / (1.0 + np.exp(-np.clip(a.v, -60, 60)))
    return T(out, (a,), lambda g: (g * out * (1.0 - out),))


def relu(a: T) -> T:
    keep = (a.v > 0).astype(np.float64)
    return T(a.v * keep, (a,), lambda g: (g * keep,))


def softmax_masked(a: T, neg_inf_mask) -> T:
    """Softmax over the last axis with an additive mask (0 where valid,
    a large negative where masked). Rows must have >=1 valid entry."""
    z = a.v + neg_inf_mask
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    s = e / e.sum(axis=-1, keepdims=True)

    def bw(g):
        return (s * (g - (g * s).sum(axis=-1, keepdims=True)),)

    return T(s, (a,), bw)


def layernorm(a: T, gamma: T, beta: T, eps: float = 1e-5) -> T:
    mu = a.v.mean(axis=-1, keepdims=True)
    xc = a.v - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    inv = 1.0 / np.sqrt(var + eps)
    xhat = xc * inv
    out = gamma.v * xhat + beta.v

    def bw(g):
        gxh = g * gamma.v
        gx = inv * (
            gxh
            - gxh.mean(axis=-1, keepdims=True)
            - xhat * (gxh * xhat).mean(axis=-1, keepdims=True)
        )
        axes = tuple(range(g.ndim - 1))
        return gx, (g * xhat).sum(axis=axes), g.sum(axis=axes)

    return T(out, (a, gamma, beta), bw)


def concat_last(a: T, b: T) -> T:
    k = a.v.shape[-1]
    out = np.concatenate([a.v, b.v], axis=-1)
    return T(out, (a, b), lambda g: (g[..., :k], g[..., k:]))


def stack_time(nodes: list[T]) -> T:
    """Stack a list of (B, D) nodes into (B, T, D)."""
    out = np.stack([n.v for n in nodes], axis=1)

    def bw(g):
        return tuple(g[:, i, :] for i in range(len(nodes)))

    return T(out, tuple(nodes), bw)


def timestep(a: T, t: int) -> T:
    """Select (B, D) slice at time t from (B, T, D)."""
    out = a.v[:, t, :]

    def bw(g):
        gi = np.zeros_like(a.v)
        gi[:, t, :] = g
        return (gi,)

    return T(out, (a,), bw)


def row_slice(a: T, n: int) -> T:
    """First n rows of a 2-D parameter (positional embedding lookup)."""
    out = a.v[:n]

    def bw(g):
        gi = np.zeros_like(a.v)
        gi[:n] = g
        return (gi,)

    return T(out, (a,), bw)


def reshape(a: T, shape) -> T:
    old = a.v.shape
    return T(a.v.reshape(shape), (a,), lambda g: (g.reshape(old),))


def transpose(a: T, axes) -> T:
    inv = np.argsort(axes)
    return T(
        a.v.transpose(axes), (a,), lambda g: (g.transpose(tuple(inv)),)
    )


def sum_axis(a: T, axis: int) -> T:
    out = a.v.sum(axis=axis)

    def bw(g):
        return (np.repeat(np.expand_dims(g, axis), a.v.shape[axis], axis=axis),)

    return T(out, (a,), bw)


def dropout(a: T, p: float, rng: np.random.Generator, training: bool) -> T:
    if not training or p <= 0.0:
        return a
    keep = (rng.random(a.v.shape) >= p).astype(np.float64) / (1.0 - p)
    return T(a.v * keep, (a,), lambda g: (g * keep,))


def mse_loss(pred: T, y: np.ndarray) -> T:
    d = pred.v - y
    n = d.size
    return T((d * d).mean(), (pred,), lambda g: (g * 2.0 * d / n,))


def cross_entropy_loss(logits: T, y: np.ndarray) -> T:
    z = logits.v - logits.v.max(axis=-1, keepdims=True)
    e = np.exp(z)
    p = e / e.sum(axis=-1, keepdims=True)
    n = len(y)
    loss = -np.log(p[np.arange(n), y] + 1e-12).mean()

    def bw(g):
        gi = p.copy()
        gi[np.arange(n), y] -= 1.0
        return (g * gi / n,)

    return T(loss, (logits,), bw)


def backward(loss: T) -> None:
    """Reverse-accumulate gradients from a scalar loss (iterative topo
    sort — no recursion limit on long RNN chains)."""
    topo, seen, stack = [], set(), [(loss, False)]
    while stack:
        node, done = stack.pop()
        if done:
            topo.append(node)
            continue
        if id(node) in seen:
            continue
        seen.add(id(node))
        stack.append((node, True))
        for p in node.parents:
            stack.append((p, False))
    loss.g = np.ones_like(loss.v)
    for node in reversed(topo):
        if node.bw is None or node.g is None:
            continue
        for p, g in zip(node.parents, node.bw(node.g)):
            if g is None:
                continue
            p.g = g if p.g is None else p.g + g


class Adam:
    """Reference trainer.py optimizer (Adam, default betas/eps)."""

    def __init__(self, params: list[T], lr: float):
        self.params = params
        self.lr = lr
        self.m = [np.zeros_like(p.v) for p in params]
        self.s = [np.zeros_like(p.v) for p in params]
        self.t = 0

    def zero_grad(self):
        for p in self.params:
            p.g = None

    def step(self):
        self.t += 1
        b1, b2, eps = 0.9, 0.999, 1e-8
        for i, p in enumerate(self.params):
            g = p.g if p.g is not None else np.zeros_like(p.v)
            self.m[i] = b1 * self.m[i] + (1 - b1) * g
            self.s[i] = b2 * self.s[i] + (1 - b2) * g * g
            mh = self.m[i] / (1 - b1**self.t)
            sh = self.s[i] / (1 - b2**self.t)
            p.v -= self.lr * mh / (np.sqrt(sh) + eps)


# --------------------------------------------------------------------------
# model mirroring ml/sequence.py::_build_model
# --------------------------------------------------------------------------


def _linear_init(rng, fan_in, fan_out):
    w = T(rng.normal(0.0, 1.0 / np.sqrt(fan_in), size=(fan_in, fan_out)))
    b = T(np.zeros(fan_out))
    return w, b


def _linear(x: T, w: T, b: T) -> T:
    return add(matmul(x, w), b)


class NumpySeqModel:
    """Numpy twin of SeqModel (``ml/sequence.py::_build_model``):
    Linear+LayerNorm+Dropout projection, (bi)LSTM/GRU or post-norm
    Transformer encoder, attention/mean pooling over valid timesteps,
    linear head."""

    def __init__(self, spec, num_features: int):
        self.spec = spec
        self.rng = np.random.default_rng(spec.seed)
        self.params: list[T] = []
        rng = self.rng
        d = spec.hidden_dim

        def P(*nodes):
            self.params.extend(nodes)
            return nodes

        self.proj_w, self.proj_b = P(*_linear_init(rng, num_features, d))
        self.proj_gamma, self.proj_beta = P(T(np.ones(d)), T(np.zeros(d)))

        if spec.model in ("lstm", "gru"):
            self.is_rnn = True
            n_gates = 4 if spec.model == "lstm" else 3
            self.dirs = 2 if spec.bidirectional else 1
            # [layer][direction] -> (Wx, Wh, b_ih) for LSTM (torch's two
            # bias vectors are purely additive there, so a fused bias is
            # weight-equivalent), plus a separate b_hh for GRU, where
            # torch's v3 candidate gate places the hidden bias INSIDE
            # the reset gate: n = tanh(x Wxn + b_in + r*(h Whn + b_hn)).
            self.cells = []
            for layer in range(spec.num_layers):
                in_dim = d if layer == 0 else d * self.dirs
                row = []
                for _ in range(self.dirs):
                    wx = T(rng.normal(0, 1 / np.sqrt(in_dim), (in_dim, n_gates * d)))
                    wh = T(rng.normal(0, 1 / np.sqrt(d), (d, n_gates * d)))
                    b = T(np.zeros(n_gates * d))
                    P(wx, wh, b)
                    if spec.model == "gru":
                        bh = T(np.zeros(n_gates * d))
                        P(bh)
                        row.append((wx, wh, b, bh))
                    else:
                        row.append((wx, wh, b))
                self.cells.append(row)
            out_dim = d * self.dirs
        elif spec.model == "transformer":
            self.is_rnn = False
            self.pos = T(rng.normal(0, 0.02, (4096, d)))
            P(self.pos)
            self.blocks = []
            for _ in range(spec.num_layers):
                blk = {
                    "wq": _linear_init(rng, d, d),
                    "wk": _linear_init(rng, d, d),
                    "wv": _linear_init(rng, d, d),
                    "wo": _linear_init(rng, d, d),
                    "ff1": _linear_init(rng, d, d * 4),
                    "ff2": _linear_init(rng, d * 4, d),
                    "ln1": (T(np.ones(d)), T(np.zeros(d))),
                    "ln2": (T(np.ones(d)), T(np.zeros(d))),
                }
                for pair in blk.values():
                    P(*pair)
                self.blocks.append(blk)
            out_dim = d
        else:
            raise ValueError(f"unknown sequence model {spec.model!r}")

        self.out_dim = out_dim
        if spec.use_attention:
            self.attn1 = P(*_linear_init(rng, out_dim, max(out_dim // 2, 1)))
            self.attn2 = P(*_linear_init(rng, max(out_dim // 2, 1), 1))
        self.head_w, self.head_b = P(
            *_linear_init(rng, out_dim, spec.num_classes)
        )

    # -- encoder pieces ----------------------------------------------------

    def _rnn_cell(self, cell, x_t: T, h: T, c: T | None):
        d = self.spec.hidden_dim
        if self.spec.model == "lstm":
            wx, wh, b = cell
            pre = add(add(matmul(x_t, wx), matmul(h, wh)), b)
            i = sigmoid(reshape(timestep(reshape(pre, (-1, 4, d)), 0), h.v.shape))
            # NOTE: timestep() indexes axis 1 — reshape (B, 4, d) exposes the
            # gate axis there, giving the torch [i, f, g, o] gate order.
            f = sigmoid(reshape(timestep(reshape(pre, (-1, 4, d)), 1), h.v.shape))
            g = tanh(reshape(timestep(reshape(pre, (-1, 4, d)), 2), h.v.shape))
            o = sigmoid(reshape(timestep(reshape(pre, (-1, 4, d)), 3), h.v.shape))
            c2 = add(mul(f, c), mul(i, g))
            h2 = mul(o, tanh(c2))
            return h2, c2
        # GRU, torch v3 gating (nn.GRU), gate order [r, z, n]. r and z
        # read their slices of the fused pre-activation (both torch
        # biases are additive for those gates); the candidate keeps the
        # hidden matmul + its own bias INSIDE the reset gate:
        #   n = tanh(x Wxn + b_in + r * (h Whn + b_hn))
        # so weights/dynamics are interchangeable with the torch path.
        # Parameter column-slices are graph nodes whose backward pads
        # the gradient back into the full gate matrix; the unused
        # n-slice of `pre` gets zero grad from the scatter.
        wx, wh, b, bh = cell
        pre = add(add(matmul(x_t, wx), matmul(h, wh)), add(b, bh))
        r = sigmoid(reshape(timestep(reshape(pre, (-1, 3, d)), 0), h.v.shape))
        z = sigmoid(reshape(timestep(reshape(pre, (-1, 3, d)), 1), h.v.shape))
        hn = add(
            matmul(h, T(wh.v[:, 2 * d :], (wh,), lambda g: (_pad_cols(g, wh.v.shape, 2 * d),))),
            T(bh.v[2 * d :], (bh,), lambda g: (_pad_cols_1d(g, bh.v.shape, 2 * d),)),
        )
        pre_n = add(
            add(
                matmul(x_t, T(wx.v[:, 2 * d :], (wx,), lambda g: (_pad_cols(g, wx.v.shape, 2 * d),))),
                T(b.v[2 * d :], (b,), lambda g: (_pad_cols_1d(g, b.v.shape, 2 * d),)),
            ),
            mul(r, hn),
        )
        n = tanh(pre_n)
        one_minus_z = cadd(cmul(z, -1.0), 1.0)
        h2 = add(mul(one_minus_z, n), mul(z, h))
        return h2, None

    def _run_rnn(self, h_seq: T, training: bool):
        spec = self.spec
        B, Tlen, _ = h_seq.v.shape
        d = spec.hidden_dim
        x_layer = h_seq
        for layer, row in enumerate(self.cells):
            dir_outs = []
            for di in range(self.dirs):
                order = range(Tlen) if di == 0 else range(Tlen - 1, -1, -1)
                h = T(np.zeros((B, d)))
                c = T(np.zeros((B, d))) if spec.model == "lstm" else None
                outs: list[T | None] = [None] * Tlen
                for t in order:
                    h, c = self._rnn_cell(row[di], timestep(x_layer, t), h, c)
                    outs[t] = h
                dir_outs.append(stack_time(outs))
            out = dir_outs[0] if self.dirs == 1 else concat_last(*dir_outs)
            if layer < spec.num_layers - 1 and spec.num_layers > 1:
                out = dropout(out, spec.dropout, self.rng, training)
            x_layer = out
        return x_layer

    def _run_transformer(self, h_seq: T, mask: np.ndarray, training: bool):
        spec = self.spec
        B, Tlen, d = h_seq.v.shape
        H = spec.num_heads
        dh = d // H
        x = add(h_seq, reshape(row_slice(self.pos, Tlen), (1, Tlen, d)))
        # key-padding mask: large negative where the KEY position is padding
        neg = np.where(mask[:, None, None, :], 0.0, -1e30)
        for blk in self.blocks:
            q = transpose(reshape(_linear(x, *blk["wq"]), (B, Tlen, H, dh)), (0, 2, 1, 3))
            k = transpose(reshape(_linear(x, *blk["wk"]), (B, Tlen, H, dh)), (0, 2, 1, 3))
            v = transpose(reshape(_linear(x, *blk["wv"]), (B, Tlen, H, dh)), (0, 2, 1, 3))
            scores = cmul(matmul(q, transpose(k, (0, 1, 3, 2))), 1.0 / np.sqrt(dh))
            w = softmax_masked(scores, neg)
            ctx = reshape(transpose(matmul(w, v), (0, 2, 1, 3)), (B, Tlen, d))
            attn_out = dropout(_linear(ctx, *blk["wo"]), spec.dropout, self.rng, training)
            x = layernorm(add(x, attn_out), *blk["ln1"])
            ff = _linear(
                dropout(relu(_linear(x, *blk["ff1"])), spec.dropout, self.rng, training),
                *blk["ff2"],
            )
            x = layernorm(add(x, dropout(ff, spec.dropout, self.rng, training)), *blk["ln2"])
        return x

    # -- forward -----------------------------------------------------------

    def forward(self, x_np: np.ndarray, mask_np: np.ndarray, training: bool = True) -> T:
        spec = self.spec
        x = T(x_np)
        h = dropout(
            layernorm(_linear(x, self.proj_w, self.proj_b), self.proj_gamma, self.proj_beta),
            spec.dropout,
            self.rng,
            training,
        )
        if self.is_rnn:
            enc = self._run_rnn(h, training)
        else:
            enc = self._run_transformer(h, mask_np, training)
        if spec.use_attention:
            s = _linear(tanh(_linear(enc, *self.attn1)), *self.attn2)  # (B,T,1)
            s = reshape(s, s.v.shape[:2])
            w = softmax_masked(s, np.where(mask_np, 0.0, -1e30))  # (B,T)
            pooled = sum_axis(mul(reshape(w, (*w.v.shape, 1)), enc), 1)
        else:
            m = mask_np[..., None].astype(np.float64)
            pooled = cmul(
                sum_axis(cmul(enc, m), 1),
                1.0 / np.maximum(m.sum(axis=1), 1.0),
            )
        out = _linear(pooled, self.head_w, self.head_b)
        if spec.num_classes == 1:
            out = reshape(out, (out.v.shape[0],))
        return out

    def state_arrays(self) -> list[np.ndarray]:
        return [p.v.copy() for p in self.params]

    def load_state_arrays(self, arrays: list[np.ndarray]) -> None:
        for p, a in zip(self.params, arrays):
            p.v = a.copy()


def _pad_cols(g, shape, start):
    gi = np.zeros(shape)
    gi[:, start : start + g.shape[1]] = g
    return gi


def _pad_cols_1d(g, shape, start):
    gi = np.zeros(shape)
    gi[start : start + g.shape[0]] = g
    return gi


# --------------------------------------------------------------------------
# training loop — mirrors ml/sequence.py::_train_fn (single process)
# --------------------------------------------------------------------------


def train_numpy(staged_path: str, spec_dict: dict, out_path: str) -> dict:
    """Single-process numpy twin of ``_train_fn``: same shard reader
    (:func:`~.sequence.load_staged_shard`), same seeded shuffling, Adam,
    and patience early stopping; saves best params as ``.npz``."""
    from .sequence import PatienceTracker, SequenceModelSpec, load_staged_shard

    spec = SequenceModelSpec(**spec_dict)
    x, mask, labels = load_staged_shard(staged_path, rank=0, world=1)
    x = x.astype(np.float64)
    if spec.task_type == "classification":
        y = labels.astype(np.int64)
        if (y < 0).any() or (y >= spec.num_classes).any():
            raise ValueError(
                f"classification labels must lie in [0, {spec.num_classes}); "
                f"staged labels span [{y.min()}, {y.max()}]"
            )
        loss_of = cross_entropy_loss
    else:
        y = labels.astype(np.float64)
        loss_of = mse_loss

    model = NumpySeqModel(spec, num_features=x.shape[-1])
    opt = Adam(model.params, lr=spec.lr)

    tracker = PatienceTracker(spec.patience)
    best_state = None
    n = x.shape[0]
    history = []
    for epoch in range(spec.max_epochs):
        perm = np.random.default_rng(spec.seed + epoch).permutation(n)
        total = 0.0
        for i in range(0, n, spec.batch_size):
            idx = perm[i : i + spec.batch_size]
            opt.zero_grad()
            out = model.forward(x[idx], mask[idx], training=True)
            loss = loss_of(out, y[idx])
            backward(loss)
            opt.step()
            total += float(loss.v) * len(idx)
        total /= n
        history.append(total)
        improved, stop = tracker.update(total)
        if improved:
            best_state = model.state_arrays()
        elif stop:
            break
    if best_state is not None:
        model.load_state_arrays(best_state)
    np.savez(
        out_path,
        **{f"p{i}": a for i, a in enumerate(model.state_arrays())},
        num_features=np.int64(x.shape[-1]),
    )
    return {
        "final_loss": tracker.best,
        "epochs_run": epoch + 1,
        "loss_history": history,
        "backend": "numpy",
    }
