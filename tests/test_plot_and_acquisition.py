"""Tests for plotting utilities and acquisition module logic (the parts
testable without network / pygrib / cdsapi)."""

import os
from datetime import datetime

import numpy as np
import pytest

from dlwp_tpu.plot import (
    plot_global_map,
    history_plot,
    forecast_example_plot,
    zonal_mean_plot,
    plot_movie,
    radar_colormap,
    blue_red_colormap,
    rgb_colormap,
    shifted_color_map,
    remove_chars,
    rotate_vector_r,
)
from dlwp_tpu.data.cfs import CFSReanalysis, six_hourly_dates, VARIABLE_ALIASES
from dlwp_tpu.data.era5 import ERA5Reanalysis, PRESSURE_LEVELS


class TestPlotUtils:
    def test_colormaps(self):
        assert radar_colormap().N == 16
        assert blue_red_colormap(64).N == 64
        cm = rgb_colormap([(255, 0, 0), (0, 0, 255)])
        assert cm(0.0)[0] > 0.9  # starts red
        sc = shifted_color_map(blue_red_colormap(), midpoint=0.3)
        assert sc is not None

    def test_remove_chars(self):
        assert remove_chars("HGT/500 mb") == "HGT500mb"

    def test_rotate_vector_identity_projection(self):
        # With an identity "projection" scaled by cos(lat) in x, rotation
        # preserves magnitude.
        lons = np.arange(0, 360, 30.0)
        lats = np.linspace(-60, 60, 5)
        u = np.ones((5, 12))
        v = np.zeros((5, 12))
        proj = lambda lo, la: (lo, la)
        uo, vo = rotate_vector_r(proj, u, v, lons, lats)
        np.testing.assert_allclose(np.hypot(uo, vo), np.hypot(u, v), atol=1e-6)


class TestPlotFunctions:
    def test_figures_render(self, tmp_path):
        lat = np.linspace(90, -90, 19)
        lon = np.arange(0, 360, 10.0)
        field = np.random.RandomState(0).randn(19, 36)
        ax = plot_global_map(lat, lon, field, title="test")
        assert ax is not None

        fig = history_plot({"loss": [3, 2, 1], "val_loss": [3.5, 2.5, 1.5]},
                           file_path=str(tmp_path / "hist.png"))
        assert os.path.exists(tmp_path / "hist.png")

        forecast_example_plot(field, field * 1.1, lat, lon, f_hour=24,
                              file_path=str(tmp_path / "ex.png"))
        assert os.path.exists(tmp_path / "ex.png")

        zonal_mean_plot(field, lat, file_path=str(tmp_path / "zm.png"))
        assert os.path.exists(tmp_path / "zm.png")

    def test_movie(self, tmp_path):
        lat = np.linspace(90, -90, 10)
        lon = np.arange(0, 360, 36.0)
        fields = np.random.RandomState(1).randn(3, 10, 10)
        out = plot_movie(fields, lat, lon, str(tmp_path / "m.gif"),
                         titles=["a", "b", "c"], fps=2)
        assert os.path.exists(out)


class TestCFSLogic:
    def test_six_hourly_expansion(self):
        dates = six_hourly_dates(datetime(2000, 1, 1), datetime(2000, 1, 2))
        assert len(dates) == 5
        assert dates[1] == datetime(2000, 1, 1, 6)

    def test_url_and_path_construction(self, tmp_path):
        cfs = CFSReanalysis(root_directory=str(tmp_path), resolution="l",
                            run_type="06")
        dt = datetime(2003, 7, 15, 6)
        assert cfs.grib_path(dt) == (
            "2003/200307/20030715/pgbl06.gdas.2003071506.grb2"
        )
        assert cfs.grib_url(dt).startswith("https://nomads.ncdc.noaa.gov/")
        assert cfs.ny == 73 and cfs.nx == 144
        hi = CFSReanalysis(root_directory=str(tmp_path), resolution="h")
        assert hi.ny == 361 and hi.nx == 720
        with pytest.raises(ValueError):
            CFSReanalysis(resolution="x")
        with pytest.raises(ValueError):
            CFSReanalysis(run_type="99")

    def test_set_dates_fill_hourly(self, tmp_path):
        cfs = CFSReanalysis(root_directory=str(tmp_path))
        cfs.set_dates([datetime(2000, 1, 1), datetime(2000, 1, 2)])
        assert len(cfs.dataset_dates) == 5  # 6-hourly fill

    def test_monthly_roundtrip_without_pygrib(self, tmp_path):
        """Write a synthetic monthly file directly and open via the
        DataSource API (decode path needs pygrib; storage path does not)."""
        import h5py

        cfs = CFSReanalysis(root_directory=str(tmp_path))
        cfs.set_dates([datetime(2000, 1, 1), datetime(2000, 1, 1, 18)])
        path = cfs.monthly_file(2000, 1)
        times = np.array(cfs.dataset_dates, dtype="datetime64[ns]")
        with h5py.File(path, "w") as f:
            f.create_dataset("time", data=times.astype(np.int64))
            f.create_dataset("level", data=np.array([500, 1000]))
            f.create_dataset("lat", data=np.linspace(90, -90, 73))
            f.create_dataset("lon", data=np.arange(144) * 2.5)
            f.create_dataset(
                "gh", data=np.random.RandomState(0).randn(4, 2, 73, 144)
            )
        cfs.open([(2000, 1)])
        assert cfs.times.shape == (4,)
        f500 = cfs.field("HGT", 500)  # alias resolution
        assert f500.shape == (4, 73, 144)
        with pytest.raises(ValueError):
            cfs.closest_lat_lon(45.0, 500.0)
        idx = cfs.closest_lat_lon(45.0, 180.0)
        assert cfs.lat[idx[0]] == 45.0

    def test_retrieve_requires_no_network_when_cached(self, tmp_path):
        cfs = CFSReanalysis(root_directory=str(tmp_path))
        dt = datetime(2000, 1, 1)
        cfs.set_dates([dt])
        # Pre-create all the files so no network access happens.
        for d in cfs.dataset_dates:
            p = os.path.join(str(tmp_path), cfs.grib_path(d))
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as f:
                f.write(b"x")
        cfs.retrieve()
        assert len(cfs.raw_files) == len(cfs.dataset_dates)


class TestERA5Logic:
    def test_variable_and_level_validation(self, tmp_path):
        era = ERA5Reanalysis(root_directory=str(tmp_path))
        era.set_variables(["geopotential", "temperature"])
        with pytest.raises(ValueError):
            era.set_variables(["bogus_variable"])
        era.set_levels([500, 1000])
        with pytest.raises(ValueError):
            era.set_levels([123])
        assert 500 in PRESSURE_LEVELS

    def test_request_construction(self, tmp_path):
        era = ERA5Reanalysis(root_directory=str(tmp_path))
        dates = [datetime(2000, 1, 1), datetime(2001, 6, 1)]
        req = era.build_request(
            "geopotential", 500, dates, request_kwargs={"grid": [2.0, 2.0]}
        )
        assert req["pressure_level"] == "500"
        assert req["year"] == ["2000", "2001"]
        assert req["grid"] == [2.0, 2.0]
        assert req["time"] == ["00:00", "06:00", "12:00", "18:00"]
        req_sfc = era.build_request("2m_temperature", None, dates)
        assert "pressure_level" not in req_sfc

    def test_file_path(self, tmp_path):
        era = ERA5Reanalysis(root_directory=str(tmp_path), file_id="_test")
        p = era.file_path("geopotential", 500)
        assert p.endswith("era5_z_500_test.nc")

    def test_retrieve_without_cdsapi_raises(self, tmp_path):
        era = ERA5Reanalysis(root_directory=str(tmp_path))
        import dlwp_tpu.data.era5 as mod

        if mod.cdsapi is None:
            with pytest.raises(RuntimeError, match="cdsapi"):
                era.retrieve(["geopotential"], [500],
                             [datetime(2000, 1, 1)])


class TestCFSReforecast:
    def test_end_date_logic(self):
        from dlwp_tpu.data.cfs import CFSReforecast

        c = CFSReforecast(root_directory="/tmp/cfsrf")
        # 00Z runs: 1st of the month ~4 months out (cfsr.py:817-824).
        assert c.end_date(datetime(2003, 1, 1, 0)) == datetime(2003, 5, 1)
        # off-hour runs: 45 days.
        assert c.end_date(datetime(2003, 1, 15, 6)) == datetime(2003, 3, 1, 6)

    def test_monthly_roundtrip(self, tmp_path):
        import h5py
        from dlwp_tpu.data.cfs import CFSReforecast

        c = CFSReforecast(root_directory=str(tmp_path))
        times = np.array(
            [datetime(2003, 1, 1), datetime(2003, 1, 1, 6)],
            dtype="datetime64[ns]",
        )
        with h5py.File(c.monthly_file("z500", 2003, 1), "w") as f:
            f.create_dataset("time", data=times.astype(np.int64))
            f.create_dataset("f_hour", data=np.arange(0, 49, 6))
            f.create_dataset("lat", data=np.linspace(90, -90, 181))
            f.create_dataset("lon", data=np.arange(360.0))
            f.create_dataset(
                "z500",
                data=np.random.RandomState(0).rand(9, 2, 181, 360).astype(
                    np.float32
                ),
            )
        c.open("z500", [(2003, 1)])
        fc = c.forecast("z500")
        assert fc.shape == (9, 2, 181, 360)
        assert c.f_hours[-1] == 48

    def test_regrid(self):
        from dlwp_tpu.data.cfs import _regrid

        lat = np.linspace(90, -90, 19)
        lon = np.arange(0, 360, 10.0)
        vals = np.outer(np.sin(np.radians(lat)), np.ones(36))
        out, la2, lo2 = _regrid(vals, lat, lon,
                                np.linspace(90, -90, 37),
                                np.arange(0, 360, 5.0))
        assert out.shape == (37, 72)
        # Value at the equator row stays ~0; poles ~ +-1.
        assert abs(out[18].mean()) < 1e-6
        assert out[0].mean() > 0.9


class TestSamplesSampler:
    def test_batches_from_samples_format(self):
        from dlwp_tpu.data import Preprocessor, SamplesSampler
        from test_data import SyntheticSource

        pp = Preprocessor(SyntheticSource(n=20))
        ds = pp.data_to_samples(["HGT"], [500], time_steps=2)
        s = SamplesSampler(ds, batch_size=5)
        x, y = s[0]
        assert x.shape == (5, 2, 9, 18)  # time folded into channels
        assert y.shape == (5, 2, 9, 18)
        assert len(s) == int(np.ceil(ds.predictors.shape[0] / 5))
        # Keep time axis for recurrent models.
        s2 = SamplesSampler(ds, batch_size=5, is_recurrent=True)
        x2, _ = s2[0]
        assert x2.shape == (5, 2, 1, 9, 18)

    def test_requires_targets(self):
        from dlwp_tpu.data import SamplesSampler
        from test_data import make_series

        with pytest.raises(ValueError, match="samples-format"):
            SamplesSampler(make_series())


class TestCallbacks:
    def test_learning_rate_tracker(self):
        from dlwp_tpu.train import LearningRateTracker

        t = LearningRateTracker(1e-3, kind="sgd", decay=0.1)
        assert t.effective_lr(0) == 1e-3 / 1.1
        ta = LearningRateTracker(1e-3, kind="adam")
        assert ta.effective_lr(0) > 0

    def test_run_history_jsonl(self, tmp_path):
        import json
        from dlwp_tpu.train import JsonlRun, RunHistory

        run = JsonlRun(str(tmp_path / "run.jsonl"))
        cb = RunHistory(run)
        cb(0, {"loss": 1.5, "val_loss": 2.0}, None)
        lines = [json.loads(l) for l in open(tmp_path / "run.jsonl")]
        assert {l["key"] for l in lines} == {"loss", "val_loss"}

    def test_batch_history(self):
        from dlwp_tpu.train import BatchHistory

        bh = BatchHistory()
        bh.on_batch(1.0)
        bh.on_batch(0.5)
        bh(0, {}, None)
        assert bh.batch_losses == [[1.0, 0.5]]


class TestCFSPlot:
    def test_quicklook_plot(self, tmp_path):
        import h5py

        cfs = CFSReanalysis(root_directory=str(tmp_path))
        cfs.set_dates([datetime(2000, 1, 1)])
        with h5py.File(cfs.monthly_file(2000, 1), "w") as f:
            f.create_dataset("time", data=np.array(
                [np.datetime64("2000-01-01")], dtype="datetime64[ns]"
            ).astype(np.int64))
            f.create_dataset("level", data=np.array([500]))
            f.create_dataset("lat", data=np.linspace(90, -90, 19))
            f.create_dataset("lon", data=np.arange(36) * 10.0)
            f.create_dataset("gh", data=np.random.RandomState(0).rand(1, 1, 19, 36))
        cfs.open([(2000, 1)])
        ax = cfs.plot("HGT", 500)
        assert ax is not None


class TestGribParams:
    def test_default_pressure_level_set(self):
        """The canonical CFS pl variables resolve to their NCEP GRIB2 code
        triples (reference cfsr_pgb_grib_table.csv identities)."""
        from dlwp_tpu.data.grib_params import lookup

        expect = {
            "HGT": (0, 3, 5), "TMP": (0, 0, 0), "UGRD": (0, 2, 2),
            "VGRD": (0, 2, 3), "VVEL": (0, 2, 8), "SPFH": (0, 1, 0),
            "RH": (0, 1, 1), "ABSV": (0, 2, 10), "STRM": (0, 2, 4),
            "CLWMR": (0, 1, 22), "GPA": (0, 3, 9), "5WAVH": (0, 3, 193),
        }
        for name, triple in expect.items():
            p = lookup(name)
            assert p is not None, name
            assert (p.discipline, p.category, p.number) == triple, name
            assert p.level_kind == "pl", name

    def test_spelling_variants(self):
        from dlwp_tpu.data.grib_params import lookup

        # Reference-table spellings with spaces, and pygrib shortNames.
        assert lookup("U GRD") == lookup("UGRD") == lookup("u")
        assert lookup("R H") == lookup("RH") == lookup("r")
        assert lookup("gh") == lookup("HGT")
        assert lookup("P WAT").level_kind == "108"
        # Exotic variables the shortName-only matcher would drop.
        assert lookup("SEAI") is not None
        assert lookup("SEAI").discipline == 10
        assert lookup("5WAVA") is not None
        assert lookup("NOT_A_VAR") is None

    def test_registry_covers_reference_breadth(self):
        """Every discipline/category block of the reference's 97-row table
        is represented (sampled per block)."""
        from dlwp_tpu.data.grib_params import GRIB2_PARAMS

        blocks = {(p.discipline, p.category) for p in GRIB2_PARAMS.values()}
        for block in [(0, 0), (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
                      (0, 6), (0, 7), (0, 14), (0, 19), (1, 0), (2, 0),
                      (2, 3), (10, 2)]:
            assert block in blocks, block
        assert len(GRIB2_PARAMS) >= 90


class _FixtureHTTPServer:
    """Tiny stdlib HTTP server serving canned bytes per path, with
    per-path scripted failures, for exercising the transfer path of
    ``retrieve()`` without egress (reference cfsr.py:274-296)."""

    def __init__(self, files, fail_counts=None, truncate_paths=()):
        import http.server
        import threading

        srv = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                srv.requests.append(self.path)
                if srv.fail_counts.get(self.path, 0) > 0:
                    srv.fail_counts[self.path] -= 1
                    self.send_error(500, "scripted transient failure")
                    return
                body = srv.files.get(self.path)
                if body is None:
                    self.send_error(404, "not found")
                    return
                self.send_response(200)
                if self.path in srv.truncate_paths:
                    # Advertise more bytes than we send, then hang up:
                    # the client's read() raises IncompleteRead mid-body.
                    self.send_header("Content-Length", str(len(body) + 64))
                    self.end_headers()
                    self.wfile.write(body[: max(1, len(body) // 2)])
                    self.wfile.flush()
                    self.connection.close()
                    return
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence
                pass

        self.files = dict(files)
        self.fail_counts = dict(fail_counts or {})
        self.truncate_paths = set(truncate_paths)
        self.requests = []
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


class TestRetrieveHTTP:
    """End-to-end ``retrieve()`` against a local HTTP fixture: fetch,
    retry-once-then-warn, idempotency skip, atomic partial-file handling
    (VERDICT r3 item 8; reference retry semantics at cfsr.py:284-296)."""

    def _cfs(self, tmp_path, server):
        cfs = CFSReanalysis(root_directory=str(tmp_path), fill_hourly=False)
        cfs._root_url = server.url
        return cfs

    def test_fetch_end_to_end(self, tmp_path):
        cfs = CFSReanalysis(root_directory=str(tmp_path), fill_hourly=False)
        dt = datetime(2000, 1, 1)
        rel = cfs.grib_path(dt)
        srv = _FixtureHTTPServer({f"/{rel}": b"GRIB-fixture-bytes"})
        try:
            cfs._root_url = srv.url
            cfs.retrieve([dt])
            local = os.path.join(str(tmp_path), rel)
            assert open(local, "rb").read() == b"GRIB-fixture-bytes"
            assert cfs.raw_files == [rel]
        finally:
            srv.close()

    def test_transient_failure_retried_once(self, tmp_path):
        cfs = CFSReanalysis(root_directory=str(tmp_path), fill_hourly=False)
        dt = datetime(2000, 1, 1)
        rel = cfs.grib_path(dt)
        srv = _FixtureHTTPServer(
            {f"/{rel}": b"ok-after-retry"}, fail_counts={f"/{rel}": 1}
        )
        try:
            cfs._root_url = srv.url
            import warnings as w

            with w.catch_warnings():
                w.simplefilter("error")  # a warning would fail the test
                cfs.retrieve([dt])
            local = os.path.join(str(tmp_path), rel)
            assert open(local, "rb").read() == b"ok-after-retry"
            assert len(srv.requests) == 2
        finally:
            srv.close()

    def test_persistent_failure_warns_and_continues(self, tmp_path):
        cfs = CFSReanalysis(root_directory=str(tmp_path), fill_hourly=False)
        d_bad, d_good = datetime(2000, 1, 1), datetime(2000, 1, 2)
        rel_bad, rel_good = cfs.grib_path(d_bad), cfs.grib_path(d_good)
        srv = _FixtureHTTPServer({f"/{rel_good}": b"good"})  # bad -> 404
        try:
            cfs._root_url = srv.url
            with pytest.warns(UserWarning, match="failed to download"):
                cfs.retrieve([d_bad, d_good])
            assert not os.path.exists(os.path.join(str(tmp_path), rel_bad))
            good = os.path.join(str(tmp_path), rel_good)
            assert open(good, "rb").read() == b"good"
            # Exactly two attempts for the failing file, one for the good.
            assert srv.requests.count(f"/{rel_bad}") == 2
        finally:
            srv.close()

    def test_idempotency_skip(self, tmp_path):
        cfs = CFSReanalysis(root_directory=str(tmp_path), fill_hourly=False)
        dt = datetime(2000, 1, 1)
        rel = cfs.grib_path(dt)
        srv = _FixtureHTTPServer({f"/{rel}": b"payload"})
        try:
            cfs._root_url = srv.url
            cfs.retrieve([dt])
            n = len(srv.requests)
            cfs.retrieve([dt])  # cached: no new HTTP traffic
            assert len(srv.requests) == n
        finally:
            srv.close()

    def test_truncated_transfer_leaves_no_partial_file(self, tmp_path):
        """A mid-body connection drop must not leave a nonzero-size file
        that a later retrieve() would mistake for a completed download."""
        cfs = CFSReanalysis(root_directory=str(tmp_path), fill_hourly=False)
        dt = datetime(2000, 1, 1)
        rel = cfs.grib_path(dt)
        path = f"/{rel}"
        srv = _FixtureHTTPServer(
            {path: b"full-grib-payload"}, truncate_paths=[path]
        )
        try:
            cfs._root_url = srv.url
            with pytest.warns(UserWarning, match="failed to download"):
                cfs.retrieve([dt])
            local = os.path.join(str(tmp_path), rel)
            assert not os.path.exists(local)
            assert not os.path.exists(local + ".part")
            # Server heals: the next retrieve completes the download.
            srv.truncate_paths.clear()
            cfs.retrieve([dt])
            assert open(local, "rb").read() == b"full-grib-payload"
        finally:
            srv.close()

    def test_reforecast_fetch(self, tmp_path):
        from dlwp_tpu.data.cfs import CFSReforecast

        rf = CFSReforecast(root_directory=str(tmp_path))
        rf.variables = ["z500"]
        dt = datetime(2000, 1, 1)
        rf.set_dates([dt])
        rel = rf.grib_path("z500", dt)
        srv = _FixtureHTTPServer({f"/{rel}": b"reforecast-bytes"})
        try:
            rf._root_url = srv.url
            rf.retrieve()
            local = os.path.join(str(tmp_path), rel)
            assert open(local, "rb").read() == b"reforecast-bytes"
        finally:
            srv.close()
