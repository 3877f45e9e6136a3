"""Minimal shapely stand-in for importing the reference code in-container.

The real shapely (GEOS) is not in this image. The reference uses only:
``Polygon(coords)``, ``.buffer(0)``, ``.area``, and ``.intersection(x).area``
on convex quadrilaterals. This shim implements exactly that surface with an
independent float64 Sutherland-Hodgman clip + shoelace area (NOT the
framework's candidate-point kernel), so reference-vs-ours A/B tests are not
circular through a shared geometry backend.
"""
