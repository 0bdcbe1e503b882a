"""Step-by-step numpy LSTM oracle.

The reference's BiLSTM math lives in TF's C++ Eigen kernels
(`bidirectional_dynamic_rnn(LSTMCell)`, SURVEY.md §4.4).  This oracle pins
the exact cell equations our lax.scan implementation must reproduce:

    gates = x_t @ Wx + h_{t-1} @ Wh + b          (gate order i, g, f, o)
    i = sigmoid(.)   g = tanh(.)   f = sigmoid(. + forget_bias)
    c_t = f * c_{t-1} + i * g
    h_t = o * tanh(c_t)

Bidirectional: the backward pass runs over the time-reversed sequence
*within each utterance's true length* (the classic parity bug vs padded
flip — SURVEY.md §8 "hard parts").
"""

from __future__ import annotations

import numpy as np


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def lstm_forward(
    x: np.ndarray,  # [T, F]
    wx: np.ndarray,  # [F, 4H] gate order i, g, f, o
    wh: np.ndarray,  # [H, 4H]
    b: np.ndarray,  # [4H]
    forget_bias: float = 0.0,
) -> np.ndarray:
    """Unidirectional LSTM over one (unpadded) sequence. Returns h [T, H]."""
    T = x.shape[0]
    H = wh.shape[0]
    h = np.zeros(H)
    c = np.zeros(H)
    out = np.zeros((T, H))
    for t in range(T):
        z = x[t] @ wx + h @ wh + b
        i = _sigmoid(z[0 * H : 1 * H])
        g = np.tanh(z[1 * H : 2 * H])
        f = _sigmoid(z[2 * H : 3 * H] + forget_bias)
        o = _sigmoid(z[3 * H : 4 * H])
        c = f * c + i * g
        h = o * np.tanh(c)
        out[t] = h
    return out


def bilstm_forward(
    x: np.ndarray,  # [T, F] (true length T, no padding)
    params_fwd: tuple[np.ndarray, np.ndarray, np.ndarray],
    params_bwd: tuple[np.ndarray, np.ndarray, np.ndarray],
    forget_bias: float = 0.0,
) -> np.ndarray:
    """BiLSTM over one sequence: concat(fwd(x), reverse(bwd(reverse(x)))).

    Returns [T, 2H].
    """
    fwd = lstm_forward(x, *params_fwd, forget_bias=forget_bias)
    bwd = lstm_forward(x[::-1], *params_bwd, forget_bias=forget_bias)[::-1]
    return np.concatenate([fwd, bwd], axis=-1)
