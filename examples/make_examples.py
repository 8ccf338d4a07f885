"""Regenerate the shipped example data artifacts.

The reference ships runnable data files (samples/NumpyroExamples/CoinToss/
CoinToss.data.json, eight_schools.data.json, samples/NBody/pl{2,3,100,1k}.txt,
format parsed by MiscFunctions.py:8-43). These are the same *formats*,
freshly generated from seeded RNGs / physics (not copied): coin flips are
drawn from the stated biases, N-body clusters are virialised Plummer-sphere
samples, and the eight-schools table is the public Rubin (1981) dataset the
reference also uses.

Run from the repo root:  python examples/make_examples.py
"""

from __future__ import annotations

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def coin_toss(path: str, *, p1: float = 0.7, p2: float = 0.3,
              n: int = 100, seed: int = 20220801) -> None:
    """Two independent coin-flip series + their true biases (the reference
    records p1/p2 so the example can report posterior-mean error,
    CoinTossExample.py:59-65)."""
    rng = np.random.RandomState(seed)
    data = {
        "c1": rng.binomial(1, p1, size=n).astype(float).tolist(),
        "c2": rng.binomial(1, p2, size=n).astype(float).tolist(),
        "p1": p1,
        "p2": p2,
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def eight_schools(path: str) -> None:
    """Rubin (1981) eight-schools data — the public dataset the reference
    ships (eight_schools.data.json)."""
    data = {
        "J": 8,
        "y": [28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0],
        "sigma": [15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0],
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def _write_nbody(path: str, mass, x, v, tmax: float, dt: float) -> None:
    """Reference N-body text format: ``N tmax dt`` header, N mass lines,
    N position rows, N velocity rows (MiscFunctions.py:8-43)."""
    n = len(mass)
    lines = [f" {n}  {tmax}  {dt}"]
    lines += [f"{m:.8e}" for m in mass]
    for arr in (x, v):
        lines += [" ".join(f"{c: .10e}" for c in row) for row in arr]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def pl2(path: str) -> None:
    """Equal-mass circular binary in natural units (G = 1): separation
    d = 2, each body at radius r = 1 with circular speed
    v = sqrt(G m_other r / d^2)."""
    m = 0.5
    vc = np.sqrt(m * 1.0 / 4.0)
    mass = [m, m]
    x = [[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]
    v = [[0.0, -vc, 0.0], [0.0, vc, 0.0]]
    _write_nbody(path, mass, x, v, tmax=50.0, dt=0.01)


def pl3(path: str) -> None:
    """Hierarchical triple: tight binary + distant light companion on a
    wide circular orbit around the binary's barycentre."""
    m1, m2, m3 = 0.5, 0.5, 1e-3
    vc_in = np.sqrt(0.5 * 1.0 / 4.0)
    r_out = 10.0
    vc_out = np.sqrt((m1 + m2) / r_out)
    mass = [m1, m2, m3]
    x = [[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [r_out, 0.0, 0.0]]
    v = [[0.0, -vc_in, 0.0], [0.0, vc_in, 0.0], [0.0, vc_out, 0.0]]
    _write_nbody(path, mass, x, v, tmax=100.0, dt=0.01)


def plummer(path: str, n: int, *, seed: int, tmax: float, dt: float) -> None:
    """Virialised equal-mass Plummer sphere (standard Aarseth et al. 1974
    sampling), total mass 1, scale radius a = 3 pi / 16 so E = -1/4."""
    rng = np.random.RandomState(seed)
    a = 3.0 * np.pi / 16.0
    mass = np.full(n, 1.0 / n)

    # radius by inverse-CDF of the Plummer cumulative mass profile
    mfrac = rng.uniform(1e-6, 1.0 - 1e-6, n)
    r = a / np.sqrt(mfrac ** (-2.0 / 3.0) - 1.0)
    costh = rng.uniform(-1.0, 1.0, n)
    phi = rng.uniform(0.0, 2.0 * np.pi, n)
    sinth = np.sqrt(1.0 - costh**2)
    x = r[:, None] * np.stack(
        [sinth * np.cos(phi), sinth * np.sin(phi), costh], axis=1)

    # speed by von Neumann rejection against g(q) = q^2 (1 - q^2)^{7/2}
    q = np.zeros(n)
    todo = np.ones(n, bool)
    while todo.any():
        k = int(todo.sum())
        q_try = rng.uniform(0.0, 1.0, k)
        g_try = rng.uniform(0.0, 0.1, k)
        ok = g_try < q_try**2 * (1.0 - q_try**2) ** 3.5
        idx = np.flatnonzero(todo)[ok]
        q[idx] = q_try[ok]
        todo[idx] = False
    # phi(r) = -G M / sqrt(r^2 + a^2)  (G = M = 1)
    v_esc = np.sqrt(2.0) * (r**2 + a**2) ** -0.25
    speed = q * v_esc
    costh_v = rng.uniform(-1.0, 1.0, n)
    phi_v = rng.uniform(0.0, 2.0 * np.pi, n)
    sinth_v = np.sqrt(1.0 - costh_v**2)
    v = speed[:, None] * np.stack(
        [sinth_v * np.cos(phi_v), sinth_v * np.sin(phi_v), costh_v], axis=1)

    # centre-of-mass frame
    x -= x.mean(axis=0)
    v -= v.mean(axis=0)
    _write_nbody(path, mass.tolist(), x, v, tmax=tmax, dt=dt)


def main() -> None:
    coin_toss(os.path.join(HERE, "coin_toss.data.json"))
    eight_schools(os.path.join(HERE, "eight_schools.data.json"))
    nb = os.path.join(HERE, "nbody")
    os.makedirs(nb, exist_ok=True)
    pl2(os.path.join(nb, "pl2.txt"))
    pl3(os.path.join(nb, "pl3.txt"))
    plummer(os.path.join(nb, "pl100.txt"), 100, seed=100,
            tmax=10.0, dt=0.001)
    plummer(os.path.join(nb, "pl1k.txt"), 1000, seed=1000,
            tmax=1.0, dt=0.0005)
    print("wrote examples under", HERE)


if __name__ == "__main__":
    main()
