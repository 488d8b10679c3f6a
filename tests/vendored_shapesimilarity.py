"""Test-only vendored copy of the ``shapesimilarity`` algorithm.

Upstream: nelsonwenner/shape-similarity (MIT), the package the reference
installs and patches (``/root/reference/patches/shapesimilarity.patch``)
to score generation (``finetune_generation.py:186-225``).  The package is
not shipped in this environment and there is no network egress, so this
module is a line-faithful RECONSTRUCTION of the upstream algorithm in the
upstream's own style (scalar, per-curve-pair, plain Python loops): equal
arc-length rebalance to 50 points, procrustes center + RMS scale,
rotation search (procrustes angle + 10 linear probes over ±π), discrete
Fréchet distance, similarity = max(0, 1 - minF / (geoAvgLen / sqrt(2)))
rounded to 4 decimals.  The reference's patch (a 1e-8 in the denominator,
verbatim in the .patch file) is applied, as the reference runs it.

Parity status: because the literal upstream bytes are unobtainable
offline, this anchors ``pianobart_tpu.utils.fad`` to an independent
reconstruction of the published algorithm, not to the upstream file
itself — two structurally different implementations (batched numpy /
jitted jax vs scalar loops) agreeing on random curves.
"""
import math

import numpy as np

ESTIMATION_POINTS = 50
ROTATIONS = 10
RESTRICT_ROTATION_ANGLE = math.pi


def _point_distance(p1, p2):
    return math.hypot(p1[0] - p2[0], p1[1] - p2[1])


def curve_length(curve):
    total = 0.0
    for i in range(len(curve) - 1):
        total += _point_distance(curve[i], curve[i + 1])
    return total


def rebalance_curve(curve, num_points=ESTIMATION_POINTS):
    """Resample to ``num_points`` points at equal arc-length spacing
    (linear interpolation within segments, upstream semantics)."""
    total = curve_length(curve)
    if total == 0:
        return [curve[0]] * num_points
    step = total / (num_points - 1)
    outline = [curve[0]]
    target = step
    walked = 0.0
    i = 0
    while len(outline) < num_points - 1 and i + 1 < len(curve):
        seg = _point_distance(curve[i], curve[i + 1])
        while seg > 0 and walked + seg >= target - 1e-12 \
                and len(outline) < num_points - 1:
            frac = (target - walked) / seg
            outline.append(
                (curve[i][0] + frac * (curve[i + 1][0] - curve[i][0]),
                 curve[i][1] + frac * (curve[i + 1][1] - curve[i][1])))
            target += step
        walked += seg
        i += 1
    while len(outline) < num_points:
        outline.append(curve[-1])
    return outline


def procrustes_normalize_curve(curve, rebalance=True,
                               estimation_points=ESTIMATION_POINTS):
    balanced = rebalance_curve(curve, estimation_points) if rebalance else curve
    mean_x = sum(p[0] for p in balanced) / len(balanced)
    mean_y = sum(p[1] for p in balanced) / len(balanced)
    translated = [(p[0] - mean_x, p[1] - mean_y) for p in balanced]
    scale = math.sqrt(
        sum(p[0] * p[0] + p[1] * p[1] for p in translated) / len(translated))
    if scale == 0:
        scale = 1.0
    return [(p[0] / scale, p[1] / scale) for p in translated]


def find_procrustes_rotation_angle(curve, relative_curve):
    numerator = 0.0
    denominator = 0.0
    for (x1, y1), (x2, y2) in zip(curve, relative_curve):
        numerator += y1 * x2 - x1 * y2
        denominator += x1 * x2 + y1 * y2
    return math.atan2(numerator, denominator)


def rotate_curve(curve, theta):
    return [(p[0] * math.cos(theta) - p[1] * math.sin(theta),
             p[0] * math.sin(theta) + p[1] * math.cos(theta))
            for p in curve]


def frechet_distance(curve1, curve2):
    """Discrete Fréchet distance (iterative DP, upstream semantics)."""
    n1, n2 = len(curve1), len(curve2)
    ca = [[-1.0] * n2 for _ in range(n1)]
    ca[0][0] = _point_distance(curve1[0], curve2[0])
    for j in range(1, n2):
        ca[0][j] = max(ca[0][j - 1], _point_distance(curve1[0], curve2[j]))
    for i in range(1, n1):
        ca[i][0] = max(ca[i - 1][0], _point_distance(curve1[i], curve2[0]))
        for j in range(1, n2):
            ca[i][j] = max(
                min(ca[i - 1][j - 1], ca[i - 1][j], ca[i][j - 1]),
                _point_distance(curve1[i], curve2[j]))
    return ca[n1 - 1][n2 - 1]


def shape_similarity(shape1, shape2, rounds=ROTATIONS, check_rotation=True,
                     restrict_rotation_angle=RESTRICT_ROTATION_ANGLE):
    """Upstream entry point, with the reference repo's patch applied
    (the ``1e-8 +`` in the denominator — see the module docstring)."""
    curve1 = procrustes_normalize_curve(shape1)
    curve2 = procrustes_normalize_curve(shape2)
    geo_avg_curve_len = math.sqrt(curve_length(curve1) * curve_length(curve2))

    thetas_to_check = [0.0]
    if check_rotation:
        procrustes_theta = find_procrustes_rotation_angle(curve1, curve2)
        if procrustes_theta > math.pi:
            procrustes_theta -= 2 * math.pi
        if procrustes_theta != 0 and \
                abs(procrustes_theta) < restrict_rotation_angle:
            thetas_to_check.append(procrustes_theta)
        for i in range(rounds):
            theta = (-1 * restrict_rotation_angle
                     + (2 * i * restrict_rotation_angle) / (rounds - 1))
            thetas_to_check.append(theta)

    min_frechet_distance = float("inf")
    for theta in thetas_to_check:
        rotated_curve_1 = rotate_curve(curve1, theta)
        frechet_dist = frechet_distance(rotated_curve_1, curve2)
        if frechet_dist < min_frechet_distance:
            min_frechet_distance = frechet_dist
    # divide by Math.sqrt(2) to try to get the low results closer to
    result = max(
        1 - min_frechet_distance / (1e-8 + (geo_avg_curve_len / math.sqrt(2))),
        0)
    return round(result, 4)


def shape_similarity_track(y1, y2):
    """Score two 1-D value tracks the way the reference feeds the package:
    curves ``[(0, y0), (1, y1), ...]`` (finetune_generation.py:208-214)."""
    c1 = [(float(i), float(v)) for i, v in enumerate(np.asarray(y1))]
    c2 = [(float(i), float(v)) for i, v in enumerate(np.asarray(y2))]
    return shape_similarity(c1, c2)
