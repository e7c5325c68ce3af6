"""Scalar-loop golden models of the standard decoding equations.

Independent spec implementations (dense H, per-edge dict state) of the
sum-product and scaled min-sum message-passing equations, used to validate
the vectorized QC decoders.  Deliberately simple and slow.
"""
import numpy as np


def _sign(x):
    return np.where(x < 0, -1.0, 1.0)


def golden_message_passing(H, llr, num_iterations, mode, alpha=0.75):
    """Return beliefs (B, n) after ``num_iterations`` fixed iterations.

    mode: "minsum" (scaled) or "sumproduct".
    Update order per iteration: variable->check messages from current
    check->variable state (first iteration: channel LLRs), then check
    update, then beliefs = llr + sum of incoming check messages.
    """
    H = np.asarray(H)
    m, n = H.shape
    rows = [np.nonzero(H[i])[0] for i in range(m)]
    cols = [np.nonzero(H[:, j])[0] for j in range(n)]
    B = llr.shape[0]
    c2v = {(i, j): np.zeros(B) for i in range(m) for j in rows[i]}

    beliefs = llr.copy()
    for _ in range(num_iterations):
        # variable -> check: llr + sum of other incoming check messages
        v2c = {}
        for j in range(n):
            total = llr[:, j] + sum(c2v[(i, j)] for i in cols[j])
            for i in cols[j]:
                v2c[(i, j)] = total - c2v[(i, j)]
        # check -> variable
        for i in range(m):
            for j in rows[i]:
                others = [v2c[(i, jp)] for jp in rows[i] if jp != j]
                stack = np.stack(others)  # (d-1, B)
                sign = np.prod(_sign(stack), axis=0)
                if mode == "minsum":
                    c2v[(i, j)] = alpha * sign * np.min(np.abs(stack), axis=0)
                elif mode == "sumproduct":
                    prod = np.prod(np.tanh(np.clip(np.abs(stack), 1e-7, 20.0) / 2), axis=0)
                    c2v[(i, j)] = sign * 2 * np.arctanh(np.clip(prod, 0, 1 - 1e-12))
                else:
                    raise ValueError(mode)
        beliefs = llr + np.stack(
            [sum(c2v[(i, j)] for i in cols[j]) for j in range(n)], axis=1
        )
    return beliefs


def golden_layered_minsum(H, llr, num_iterations, alpha, Z):
    """Layered (base-row-sequential) scaled min-sum golden model.

    Lifted rows are processed in base-row-major order; all Z lifted rows of
    one base row update together (they share no variables, so this equals
    strict row-sequential processing).  Within a layer, v2c messages are
    formed from the *current* beliefs; beliefs are updated in place after
    the layer's check update.  Returns beliefs (B, n).
    """
    H = np.asarray(H)
    m, n = H.shape
    assert m % Z == 0
    rows = [np.nonzero(H[i])[0] for i in range(m)]
    B = llr.shape[0]
    c2v = {(i, j): np.zeros(B) for i in range(m) for j in rows[i]}

    beliefs = llr.copy()
    for _ in range(num_iterations):
        for r in range(m // Z):
            layer = range(r * Z, (r + 1) * Z)
            v2c = {
                (i, j): beliefs[:, j] - c2v[(i, j)] for i in layer for j in rows[i]
            }
            for i in layer:
                for j in rows[i]:
                    others = [v2c[(i, jp)] for jp in rows[i] if jp != j]
                    stack = np.stack(others)
                    sign = np.prod(_sign(stack), axis=0)
                    new = alpha * sign * np.min(np.abs(stack), axis=0)
                    beliefs[:, j] = beliefs[:, j] + new - c2v[(i, j)]
                    c2v[(i, j)] = new
    return beliefs
