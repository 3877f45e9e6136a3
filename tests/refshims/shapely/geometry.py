"""Convex-polygon Polygon shim (see package docstring for scope)."""

from __future__ import annotations

import numpy as np


def _shoelace(pts: np.ndarray) -> float:
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def _signed_area(pts: np.ndarray) -> float:
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _clip(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip `subject` by convex `clip` (both (N, 2))."""
    if _signed_area(clip) < 0:  # normalize clip to CCW so 'inside' is left
        clip = clip[::-1]
    out = list(subject)
    n = len(clip)
    for i in range(n):
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % n]
        inp, out = out, []
        if not inp:
            break
        for j in range(len(inp)):
            p, q = inp[j], inp[(j + 1) % len(inp)]
            p_in = (bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax) >= 0
            q_in = (bx - ax) * (q[1] - ay) - (by - ay) * (q[0] - ax) >= 0
            if p_in:
                out.append(p)
            if p_in != q_in:
                # segment pq crosses the (a, b) line
                dx, dy = q[0] - p[0], q[1] - p[1]
                denom = (bx - ax) * dy - (by - ay) * dx
                if abs(denom) > 1e-300:
                    # f(P) = cross(b - a, P - a); solve f(p + t*(q - p)) = 0
                    t = -((bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax)) / denom
                    out.append(np.array([p[0] + t * dx, p[1] + t * dy]))
    return np.asarray(out, np.float64).reshape(-1, 2)


class Polygon:
    def __init__(self, coords):
        pts = np.asarray(list(coords), np.float64).reshape(-1, 2)
        # drop a repeated closing vertex
        if len(pts) > 1 and np.allclose(pts[0], pts[-1]):
            pts = pts[:-1]
        self._pts = pts

    def buffer(self, distance):
        if distance != 0:
            raise NotImplementedError("shim supports only buffer(0)")
        if _shoelace(self._pts) == 0.0:
            return Polygon(np.zeros((0, 2)))  # shapely: degenerate -> empty
        return self

    @property
    def area(self) -> float:
        return _shoelace(self._pts)

    def intersection(self, other: "Polygon") -> "Polygon":
        if len(self._pts) < 3 or len(other._pts) < 3:
            return Polygon(np.zeros((0, 2)))
        return Polygon(_clip(self._pts, other._pts))
