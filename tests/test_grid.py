"""Tests for grid construction, quadrature, and insolation."""

import numpy as np
import pytest

from dlwp_tpu.grid import (
    LatLonGrid,
    clenshaw_curtis_weights,
    gaussian_latitudes,
    insolation,
    day_of_year,
)


class TestQuadrature:
    def test_clenshaw_curtis_exactness(self):
        # Exact integral of Legendre polynomials up to degree n-1.
        from numpy.polynomial.legendre import legval

        n = 33
        grid = LatLonGrid.regular(n)
        for deg in range(0, n):
            c = np.zeros(deg + 1)
            c[deg] = 1.0
            q = (grid.quad_weights * legval(grid.mu, c)).sum()
            exact = 2.0 if deg == 0 else 0.0
            assert abs(q - exact) < 1e-12, f"degree {deg}"

    def test_clenshaw_curtis_positive(self):
        for n in [9, 73, 181, 361]:
            w = clenshaw_curtis_weights(n)
            assert (w > 0).all()
            assert abs(w.sum() - 2.0) < 1e-12

    def test_gaussian_latitudes(self):
        lats, w = gaussian_latitudes(64)
        assert lats[0] > lats[-1]  # north -> south
        assert abs(w.sum() - 2.0) < 1e-12
        # Gauss-Legendre nodes are roots of P_64.
        from numpy.polynomial.legendre import legval

        c = np.zeros(65)
        c[64] = 1.0
        assert np.abs(legval(np.sin(np.radians(lats)), c)).max() < 1e-10


class TestLatLonGrid:
    def test_regular_shapes(self):
        g = LatLonGrid.regular(73, 144)
        assert g.shape == (73, 144)
        assert g.lat[0] == 90.0 and g.lat[-1] == -90.0
        assert g.lon[0] == 0.0 and abs(g.lon[1] - 2.5) < 1e-12

    def test_default_nlon(self):
        assert LatLonGrid.regular(73).nlon == 144
        assert LatLonGrid.gaussian(32).nlon == 64

    def test_coriolis(self):
        g = LatLonGrid.regular(73)
        assert abs(g.coriolis[0] - 2 * 7.29e-5) < 1e-12  # north pole
        assert abs(g.coriolis[36]) < 1e-12  # equator

    def test_cos_lat_weights(self):
        g = LatLonGrid.regular(73)
        w = g.cos_lat_weights("cosine")
        assert abs(w[36] - 1.0) < 1e-12
        assert abs(w[0]) < 1e-12
        wm = g.cos_lat_weights("midlatitude")
        # Mid-latitude boost: cos + 0.5 sin(2 lat)^2 (custom.py:977-978).
        i45 = 18  # lat = 45N
        assert wm[i45] > w[i45]
        with pytest.raises(ValueError):
            g.cos_lat_weights("bogus")

    def test_custom_grid(self):
        g = LatLonGrid.from_coords(np.linspace(70, 20, 21), np.arange(0, 360, 2.5))
        assert g.grid_type == "custom"
        assert g.shape == (21, 144)


class TestInsolation:
    def test_shapes_and_clipping(self):
        lat = np.linspace(90, -90, 19)
        lon = np.arange(0, 360, 20.0)
        sol = np.asarray(insolation(np.array([0.0, 180.25]), lat, lon))
        assert sol.shape == (2, 19, 18)
        assert (sol >= 0).all()

    def test_polar_night_and_day(self):
        lat = np.array([89.0, -89.0])
        lon = np.array([0.0, 180.0])
        # Northern winter solstice (approx day 355): polar night in north.
        sol = np.asarray(insolation(np.array([355.0]), lat, lon))
        assert sol[0, 0].max() == 0.0  # north polar night
        assert sol[0, 1].min() > 0.0  # south polar day

    def test_matches_reference_formula(self):
        # Independent recomputation of the reference formula (util.py:305-352)
        # in plain numpy for a handful of points.
        days = np.array([100.3])
        lat = np.array([37.5])
        lon = np.array([122.0])
        sol = float(np.asarray(insolation(days, lat, lon))[0, 0, 0])

        eps = np.radians(23.4441)
        ecc = 0.016715
        om = np.radians(282.7)
        beta = np.sqrt(1 - ecc**2)
        lm = ecc * (1 + beta) * np.sin(om) + 2 * np.pi * (days[0] - 80.5) / 365
        lam = lm + 2 * ecc * np.sin(lm - om)
        dec = np.arcsin(np.sin(eps) * np.sin(lam))
        h = 2 * np.pi * (days[0] + lon[0] / 360)
        rho = (1 - ecc**2) / (1 + ecc * np.cos(lam - om))
        expect = (
            np.sin(np.radians(lat[0])) * np.sin(dec)
            - np.cos(np.radians(lat[0])) * np.cos(dec) * np.cos(h)
        ) * rho**-2
        expect = max(expect, 0.0)
        assert abs(sol - expect) < 1e-10

    def test_day_of_year(self):
        d = day_of_year(np.array(["2017-01-01T06:00", "2017-07-02T00:00"], dtype="datetime64[s]"))
        assert abs(d[0] - 0.25) < 1e-9
        assert abs(d[1] - 182.0) < 1e-9

    def test_scalar_day(self):
        lat = np.linspace(90, -90, 19)
        lon = np.arange(0, 360, 20.0)
        sol = np.asarray(insolation(100.0, lat, lon))
        assert sol.shape == (19, 18)

    def test_factored_tables_match_direct(self):
        """The (3, H, W)-basis factored form (rollout fast path) matches
        the direct formula: the only algebraic differences are the cosine
        addition identity and cos(decl) = sqrt(1 - sin^2 decl)."""
        from dlwp_tpu.grid.insolation import (
            insolation_from_tables, insolation_tables,
        )

        lat = np.linspace(87.5, -87.5, 36)
        lon = np.arange(0, 360, 2.5)
        days = np.array([0.0, 33.7, 100.3, 180.25, 265.5, 355.9, 420.6])
        direct = np.asarray(insolation(days, lat, lon), dtype=np.float64)
        tables = insolation_tables(lat, lon, dtype=np.float64)
        fact = np.asarray(insolation_from_tables(days, tables))
        np.testing.assert_allclose(fact, direct, atol=5e-7)
        # Arbitrary leading shape.
        d2 = days[:6].reshape(2, 3)
        f2 = np.asarray(insolation_from_tables(d2, tables))
        assert f2.shape == (2, 3, 36, 144)
        np.testing.assert_allclose(f2.reshape(6, 36, 144), direct[:6],
                                   atol=5e-7)
