"""Reference-trajectory and benchmark-artifact IO.

Keeps the reference's on-disk formats for comparability:

- `.npy` triples ``(q_ref, xi_ref, dt)`` written back-to-back into one file
  (format defined by `visualization/convert_path_to_reference.ipynb`, read
  as in `benchmark_SE3_tracking.py:164-168`);
- benchmark result pickles with a `prob` dict carrying the full problem spec
  (J, dt, q_ref, xi_ref, x0, Q, P, R) plus per-solver solutions/histories
  (writer: `benchmark_SE3_tracking.py:272-345`).
"""

import pickle

import numpy as np


def load_reference_triple(path):
    """Load (q_ref, xi_ref, dt) from a reference .npy file."""
    with open(path, "rb") as f:
        q_ref = np.load(f)
        xi_ref = np.load(f)
        dt = np.load(f)
    return q_ref, xi_ref, float(dt)


def save_reference_triple(path, q_ref, xi_ref, dt):
    with open(path, "wb") as f:
        np.save(f, np.asarray(q_ref))
        np.save(f, np.asarray(xi_ref))
        np.save(f, np.asarray(dt))


def load_benchmark_pickle(path):
    """Load a reference benchmark results pickle (problem spec + solutions)."""
    with open(path, "rb") as f:
        return pickle.load(f)
