"""Dense-matrix numpy oracle for operator/step verification.

Independent transliteration of the reference's assembly rules into dense
matrices on the flattened v-major vector (index i + j*(m1+1)). Used ONLY in
tests, mirroring the reference's own cross-implementation test style
(ref: src/hes_A2_mat.cpp:785 compare_A2_implementations).
"""

import numpy as np


def d_weights(h, i, pos):
    """central 2nd derivative (ref delta_*, src/coeff.cpp:7-28)"""
    if pos == -1:
        return 2 / (h[i] * (h[i] + h[i + 1]))
    if pos == 0:
        return -2 / (h[i] * h[i + 1])
    return 2 / (h[i + 1] * (h[i] + h[i + 1]))


def b_weights(h, i, pos):
    """central 1st derivative (ref beta_*, src/coeff.cpp:55-76)"""
    if pos == -1:
        return -h[i + 1] / (h[i] * (h[i] + h[i + 1]))
    if pos == 0:
        return (h[i + 1] - h[i]) / (h[i] * h[i + 1])
    return h[i] / (h[i + 1] * (h[i] + h[i + 1]))


def a_weights(h, i, pos):
    """backward 1st derivative (ref alpha_*, src/coeff.cpp:31-52)"""
    if pos == -2:
        return h[i] / (h[i - 1] * (h[i - 1] + h[i]))
    if pos == -1:
        return (-h[i - 1] - h[i]) / (h[i - 1] * h[i])
    return (h[i - 1] + 2 * h[i]) / (h[i] * (h[i - 1] + h[i]))


def g_weights(h, i, pos):
    """forward 1st derivative (ref gamma_*, src/coeff.cpp:79-100)"""
    if pos == 0:
        return (-2 * h[i + 1] - h[i + 2]) / (h[i + 1] * (h[i + 1] + h[i + 2]))
    if pos == 1:
        return (h[i + 1] + h[i + 2]) / (h[i + 1] * h[i + 2])
    return -h[i + 1] / (h[i + 2] * (h[i + 1] + h[i + 2]))


def build_grid_np(m1, m2, s0, strike, v0, s_max=None, c=None, v_max=5.0, d=None):
    """Reference grid construction (ref: src/grid.cpp:16-61)."""
    s_max = 8.0 * strike if s_max is None else s_max
    c = strike / 5.0 if c is None else c
    d = v_max / 500.0 if d is None else d

    dxi = (np.arcsinh((s_max - strike) / c) - np.arcsinh(-strike / c)) / m1
    xi = np.arcsinh(-strike / c) + np.arange(m1 + 1) * dxi
    vec_s = strike + c * np.sinh(xi)
    vec_s = np.sort(np.append(vec_s, s0))[:-1]

    deta = np.arcsinh(v_max / d) / m2
    vec_v = d * np.sinh(np.arange(m2 + 1) * deta)
    vec_v = np.sort(np.append(vec_v, v0))[:-1]

    return vec_s, vec_v, np.diff(vec_s), np.diff(vec_v)


def dense_a1(vec_s, vec_v, dels, r_d, r_f):
    """A1 as a dense matrix on the flat v-major vector
    (ref: src/hes_mat_fac.cpp:61-91)."""
    m1 = len(vec_s) - 1
    m2 = len(vec_v) - 1
    m = (m1 + 1) * (m2 + 1)
    A = np.zeros((m, m))
    for j in range(m2 + 1):
        off = j * (m1 + 1)
        for i in range(1, m1):
            a = 0.5 * vec_s[i] ** 2 * vec_v[j]
            b = (r_d - r_f) * vec_s[i]
            A[off + i, off + i - 1] = a * d_weights(dels, i - 1, -1) + b * b_weights(dels, i - 1, -1)
            A[off + i, off + i] = a * d_weights(dels, i - 1, 0) + b * b_weights(dels, i - 1, 0) - 0.5 * r_d
            A[off + i, off + i + 1] = a * d_weights(dels, i - 1, 1) + b * b_weights(dels, i - 1, 1)
        A[off + m1, off + m1] = -0.5 * r_d
    return A


def dense_a2(vec_s, vec_v, delv, r_d, kappa, eta, sigma, upwind):
    """A2 as a dense matrix on the flat v-major vector.

    central: ref src/hes_A2_mat.cpp:37-109.
    upwind additions: ref src/hes_A2_mat.cpp:400-440 (row j+1 placement)."""
    m1 = len(vec_s) - 1
    m2 = len(vec_v) - 1
    m = (m1 + 1) * (m2 + 1)
    A = np.zeros((m, m))
    sp = m1 + 1

    def row_add(j_row, j_col, val):
        for i in range(m1 + 1):
            A[j_row * sp + i, j_col * sp + i] += val

    for j in range(m2 - 1):
        temp = kappa * (eta - vec_v[j])
        temp2 = 0.5 * sigma * sigma * vec_v[j]
        row_add(j, j, -0.5 * r_d)
        if upwind and vec_v[j] > 1.0:
            row_add(j + 1, j - 1, temp * a_weights(delv, j, -2))
            row_add(j + 1, j, temp * a_weights(delv, j, -1) + temp2 * d_weights(delv, j - 1, -1))
            row_add(j + 1, j + 1, temp * a_weights(delv, j, 0) + temp2 * d_weights(delv, j - 1, 0))
            row_add(j + 1, j + 2, temp2 * d_weights(delv, j - 1, 1))
        if j == 0:
            row_add(0, 0, temp * g_weights(delv, 0, 0))
            row_add(0, 1, temp * g_weights(delv, 0, 1))
            row_add(0, 2, temp * g_weights(delv, 0, 2))
        else:
            row_add(j, j - 1, temp * b_weights(delv, j - 1, -1) + temp2 * d_weights(delv, j - 1, -1))
            row_add(j, j, temp * b_weights(delv, j - 1, 0) + temp2 * d_weights(delv, j - 1, 0))
            row_add(j, j + 1, temp * b_weights(delv, j - 1, 1) + temp2 * d_weights(delv, j - 1, 1))
    return A


def dense_a0(vec_s, vec_v, dels, delv, rho, sigma):
    """A0 9-point mixed stencil as dense (ref: src/hes_mat_fac.cpp:19-40)."""
    m1 = len(vec_s) - 1
    m2 = len(vec_v) - 1
    m = (m1 + 1) * (m2 + 1)
    A = np.zeros((m, m))
    for j in range(m2 - 1):
        for i in range(m1 - 1):
            c = rho * sigma * vec_s[i + 1] * vec_v[j + 1]
            row = (i + 1) + (j + 1) * (m1 + 1)
            for k in (-1, 0, 1):
                for l in (-1, 0, 1):
                    col = (i + 1 + k) + (j + 1 + l) * (m1 + 1)
                    A[row, col] += c * b_weights(dels, i, k) * b_weights(delv, j, l)
    return A


def boundary_vectors(vec_s, m1, m2, r_d, r_f, n_steps, delta_t):
    """b1/b2 including the flat-index quirk
    (ref: src/BoundaryConditions.hpp:70-80)."""
    m = (m1 + 1) * (m2 + 1)
    b1 = np.zeros(m)
    b2 = np.zeros(m)
    efac = np.exp(-r_f * delta_t * (n_steps - 1))
    for j in range(m2 + 1):
        b1[m1 * (j + 1)] = (r_d - r_f) * vec_s[m1] * efac
    for i in range(1, m1 + 1):
        b2[m - m1 - 1 + i] = -0.5 * r_d * vec_s[i] * efac
    return b1, b2


def cs_scheme_dense(m1, m2, n_steps, delta_t, theta, r_f, A0, A1, A2, b, b1,
                    b2, u0):
    """Craig-Sneyd loop with dense solves (ref: src/solver.hpp:678-778;
    b0 is identically zero for calls)."""
    m = (m1 + 1) * (m2 + 1)
    I = np.eye(m)
    lhs1 = I - theta * delta_t * A1
    lhs2 = I - theta * delta_t * A2
    u = u0.copy()
    for n in range(1, n_steps + 1):
        e0 = np.exp(r_f * delta_t * (n - 1))
        e1 = np.exp(r_f * delta_t * n)
        a0r, a1r, a2r = A0 @ u, A1 @ u, A2 @ u
        y0 = u + delta_t * (a0r + a1r + a2r + b * e0)
        y1 = np.linalg.solve(
            lhs1, y0 + theta * delta_t * (b1 * e1 - (a1r + b1 * e0)))
        y2 = np.linalg.solve(
            lhs2, y1 + theta * delta_t * (b2 * e1 - (a2r + b2 * e0)))
        y0t = y0 + 0.5 * delta_t * (A0 @ y2 - a0r)
        y1t = np.linalg.solve(
            lhs1, y0t + theta * delta_t * (b1 * e1 - (a1r + b1 * e0)))
        u = np.linalg.solve(
            lhs2, y1t + theta * delta_t * (b2 * e1 - (a2r + b2 * e0)))
    return u


def mcs_scheme_dense(m1, m2, n_steps, delta_t, theta, r_f, A0, A1, A2, b,
                     b1, b2, u0):
    """Textbook modified Craig-Sneyd loop with dense solves (the
    reference's MCS is marked broken, ref: src/solver.hpp:915)."""
    m = (m1 + 1) * (m2 + 1)
    I = np.eye(m)
    lhs1 = I - theta * delta_t * A1
    lhs2 = I - theta * delta_t * A2
    u = u0.copy()
    for n in range(1, n_steps + 1):
        e0 = np.exp(r_f * delta_t * (n - 1))
        e1 = np.exp(r_f * delta_t * n)
        a0r, a1r, a2r = A0 @ u, A1 @ u, A2 @ u
        y0 = u + delta_t * (a0r + a1r + a2r + b * e0)
        y1 = np.linalg.solve(
            lhs1, y0 + theta * delta_t * (b1 * e1 - (a1r + b1 * e0)))
        y2 = np.linalg.solve(
            lhs2, y1 + theta * delta_t * (b2 * e1 - (a2r + b2 * e0)))
        a0_y2 = A0 @ y2
        y0h = y0 + theta * delta_t * (a0_y2 - a0r)
        full_new = a0_y2 + A1 @ y2 + A2 @ y2 + b * e1
        full_old = a0r + a1r + a2r + b * e0
        y0t = y0h + (0.5 - theta) * delta_t * (full_new - full_old)
        y1t = np.linalg.solve(
            lhs1, y0t + theta * delta_t * (b1 * e1 - (a1r + b1 * e0)))
        u = np.linalg.solve(
            lhs2, y1t + theta * delta_t * (b2 * e1 - (a2r + b2 * e0)))
    return u


def hv_scheme_dense(m1, m2, n_steps, delta_t, theta, r_f, A0, A1, A2, b,
                    b1, b2, u0):
    """Hundsdorfer-Verwer loop with dense solves (in 't Hout & Foulon
    2010, scheme (2.5); framework extension — no reference analog). The
    second-stage corrections are anchored at Y2, so their t_n boundary
    terms cancel: lhs_j y~_j = y~_{j-1} - theta dt A_j y2."""
    m = (m1 + 1) * (m2 + 1)
    I = np.eye(m)
    lhs1 = I - theta * delta_t * A1
    lhs2 = I - theta * delta_t * A2
    u = u0.copy()
    for n in range(1, n_steps + 1):
        e0 = np.exp(r_f * delta_t * (n - 1))
        e1 = np.exp(r_f * delta_t * n)
        a0r, a1r, a2r = A0 @ u, A1 @ u, A2 @ u
        y0 = u + delta_t * (a0r + a1r + a2r + b * e0)
        y1 = np.linalg.solve(
            lhs1, y0 + theta * delta_t * (b1 * e1 - (a1r + b1 * e0)))
        y2 = np.linalg.solve(
            lhs2, y1 + theta * delta_t * (b2 * e1 - (a2r + b2 * e0)))
        a1_y2 = A1 @ y2
        a2_y2 = A2 @ y2
        full_new = A0 @ y2 + a1_y2 + a2_y2 + b * e1
        full_old = a0r + a1r + a2r + b * e0
        y0t = y0 + 0.5 * delta_t * (full_new - full_old)
        y1t = np.linalg.solve(lhs1, y0t - theta * delta_t * a1_y2)
        u = np.linalg.solve(lhs2, y1t - theta * delta_t * a2_y2)
    return u


def rannacher_dense_loop(m1, m2, n_steps, rannacher_steps, delta_t, theta,
                         r_f, A0, A1, A2, b, b1, b2, u0, american=False):
    """Rannacher start-up oracle (framework extension; no reference
    analog): each of the first R steps is replaced by TWO half-dt
    fully-implicit (theta=1) Douglas sub-steps, then the remaining DO
    steps run at `theta`. Boundary e-factors use ABSOLUTE times (the
    b vectors keep the main convention's baked e^{-rate*dt*(N-1)})."""
    m = (m1 + 1) * (m2 + 1)
    I = np.eye(m)
    u = u0.copy()
    lam = np.zeros(m)

    def step(u, lam, dt, th, t0, t1):
        e0 = np.exp(r_f * t0)
        e1 = np.exp(r_f * t1)
        a0r, a1r, a2r = A0 @ u, A1 @ u, A2 @ u
        y0 = u + dt * (a0r + a1r + a2r + b * e0)
        if american:
            y0 = y0 + dt * lam
        y1 = np.linalg.solve(I - th * dt * A1,
                             y0 + th * dt * (b1 * e1 - (a1r + b1 * e0)))
        u_bar = np.linalg.solve(I - th * dt * A2,
                                y1 + th * dt * (b2 * e1 - (a2r + b2 * e0)))
        if american:
            u_new = np.maximum(u_bar - dt * lam, u0)
            lam = np.maximum(0.0, lam + (u0 - u_bar) / dt)
            lam[m1:: m1 + 1] = 0.0
            return u_new, lam
        return u_bar, lam

    R = min(rannacher_steps, n_steps)
    for k in range(1, 2 * R + 1):
        u, lam = step(u, lam, delta_t / 2, 1.0,
                      (k - 1) * delta_t / 2, k * delta_t / 2)
    for n in range(R + 1, n_steps + 1):
        u, lam = step(u, lam, delta_t, theta,
                      (n - 1) * delta_t, n * delta_t)
    return u


def do_scheme_dense(m1, m2, n_steps, delta_t, theta, r_f, A0, A1, A2, b, b1,
                    b2, u0, american=False):
    """Full DO time loop with dense solves (ref: src/solver.hpp:19-95,
    183-306 for the American lambda update)."""
    m = (m1 + 1) * (m2 + 1)
    I = np.eye(m)
    lhs1 = I - theta * delta_t * A1
    lhs2 = I - theta * delta_t * A2
    u = u0.copy()
    lam = np.zeros(m)
    for n in range(1, n_steps + 1):
        e0 = np.exp(r_f * delta_t * (n - 1))
        e1 = np.exp(r_f * delta_t * n)
        a0r, a1r, a2r = A0 @ u, A1 @ u, A2 @ u
        y0 = u + delta_t * (a0r + a1r + a2r + b * e0)
        if american:
            y0 = y0 + delta_t * lam
        rhs1 = y0 + theta * delta_t * (b1 * e1 - (a1r + b1 * e0))
        y1 = np.linalg.solve(lhs1, rhs1)
        rhs2 = y1 + theta * delta_t * (b2 * e1 - (a2r + b2 * e0))
        u_bar = np.linalg.solve(lhs2, rhs2)
        if american:
            u = np.maximum(u_bar - delta_t * lam, u0)
            lam = np.maximum(0.0, lam + (u0 - u_bar) / delta_t)
            lam[m1 :: m1 + 1] = 0.0
        else:
            u = u_bar
    return u
