"""Catalogue builder: gpkg (sqlite) round trip -> grid_dict pickle -> Loader."""

import gzip
import pickle
import sqlite3
import uuid

import numpy as np
import pytest

from kurosiwo_tpu import catalogue
from kurosiwo_tpu.data.index import load_grid_index


@pytest.fixture
def fake_gpkg(tmp_path):
    path = tmp_path / "catalogue.gpkg"
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT)")
    con.execute("INSERT INTO gpkg_contents VALUES ('grids', 'features')")
    con.execute(
        "CREATE TABLE grids (grid_id TEXT, gvalid INT, pcovered REAL, pwater REAL,"
        " pflood REAL, actid INT, aoiid INT, master INT, crank INT)"
    )
    rows = []
    rs = np.random.RandomState(0)
    for i in range(20):
        rows.append(
            (
                uuid.UUID(int=i).hex, 1, float(rs.uniform(0, 100)), float(rs.uniform(0, 20)),
                float(rs.uniform(0, 20)), 130 if i % 2 == 0 else 470, i % 3, 1, 1,
            )
        )
    rows.append((uuid.UUID(int=999).hex, 0, 50.0, 5.0, 5.0, 130, 0, 1, 1))  # invalid
    con.executemany("INSERT INTO grids VALUES (?,?,?,?,?,?,?,?,?)", rows)
    con.commit()
    con.close()
    return path


def test_read_and_filter(fake_gpkg):
    rows = catalogue.read_catalogue(fake_gpkg)
    assert len(rows) == 21
    kept = catalogue.filter_rows(rows, pcovered=[40, 100])
    assert all(40 <= r["pcovered"] <= 100 for r in kept)
    assert all(r["gvalid"] for r in kept)


def test_build_and_load_grid_dict(fake_gpkg, tmp_path):
    rows = catalogue.filter_rows(catalogue.read_catalogue(fake_gpkg))
    gd = catalogue.build_grid_dict(rows, {})
    out = tmp_path / "grid_dict.gz"
    catalogue.write_grid_dict(gd, out)
    loaded = load_grid_index(out)
    assert len(loaded) == 20  # invalid grid dropped
    one = next(iter(loaded.values()))
    assert set(one) == {"path", "info", "clz", "clz_name"}
    assert one["info"]["actid"] in (130, 470)
    # path layout: actid/aoiid02/hex
    parts = one["path"].split("/")
    assert parts[0] in ("130", "470") and len(parts[1]) == 2


def test_cli_info_and_write(fake_gpkg, tmp_path, capsys):
    out = tmp_path / "out.gz"
    catalogue.main([
        "--catalogue_path", str(fake_gpkg), "-pv", "[0,100]", "--out", str(out)
    ])
    captured = capsys.readouterr().out
    assert "Stats for query" in captured
    assert out.exists()
    with gzip.open(out, "rb") as f:
        gd = pickle.load(f)
    assert len(gd) == 20


def test_cli_bad_range(fake_gpkg):
    # ValueError, not assert: input validation must survive python -O
    with pytest.raises(ValueError):
        catalogue.main(["--catalogue_path", str(fake_gpkg), "-pv", "[0,1000]"])


def test_product_conventions():
    assert catalogue.PRODUCT_NODATA == {"IVH": 0.0, "IVV": 0.0, "MNA": 0, "MLU": 3}
    assert catalogue.product_type(True, 1) == "MS"
    assert catalogue.product_type(False, 2) == "SL"
    assert catalogue.product_type(True, 0) == "MK"
    assert catalogue.grid_rel_path(130, None, "abcdef") == "130/00/ab/abcdef"


def test_snap_graphs_ship_the_reference_chains():
    """L0 artifact parity: the SNAP graphs are runnable XML with the exact
    operator chains (reference configs/{grd,slc}_preprocessing.xml)."""
    import xml.etree.ElementTree as ET
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent / "configs"
    grd = ET.parse(root / "grd_preprocessing.xml")
    ops = [n.find("operator").text for n in grd.findall("node")]
    assert ops == [
        "Read", "Apply-Orbit-File", "Subset", "ThermalNoiseRemoval",
        "Remove-GRD-Border-Noise", "Land-Sea-Mask", "Calibration",
        "Speckle-Filter", "Terrain-Correction", "Write",
    ]
    # grid alignment is what makes tiles stack across acquisitions
    tc = [n for n in grd.findall("node") if n.get("id") == "Terrain-Correction"][0]
    assert tc.find("parameters/alignToStandardGrid").text == "true"
    assert tc.find("parameters/pixelSpacingInMeter").text == "10.0"

    slc = ET.parse(root / "slc_preprocessing.xml")
    ops = [n.find("operator").text for n in slc.findall("node")]
    assert ops.count("TOPSAR-Split") == 3
    assert ops.count("TOPSAR-Deburst") == 3
    assert ops.count("BandMaths") == 4
    exprs = {e.text for e in slc.iter("expression")}
    assert exprs == {
        "phase(i_VH ,q_VH)", "phase(i_VV ,q_VV)",
        "ampl(i_VH ,q_VH)", "ampl(i_VV ,q_VV)",
    }


def test_real_reference_yaml_parses_when_present():
    """The actual catalogue.yaml uses a custom !join tag and list-form Floods
    with cl_name joined from CL_ZONES (reference catalogue.py:33-50)."""
    from pathlib import Path

    y = Path("/root/reference/catalogue/catalogue.yaml")
    if not y.exists():
        pytest.skip("reference yaml not mounted")
    meta = catalogue.load_aoi_metadata(y)
    assert len(meta) > 10
    some = next(iter(meta.values()))["aois"]
    aoi = next(iter(some.values()))
    assert set(aoi) == {"cl_zone", "cl_name"} and aoi["cl_name"] is not None


def test_grid_dict_excludes_non_aoi_grids(fake_gpkg, tmp_path):
    """aoiid NULL/999999 grids are not in the distributed corpus; the
    reference grid-dict builder skips them (catalogue.py:479-480)."""
    import sqlite3 as sq
    import uuid as uu

    con = sq.connect(fake_gpkg)
    con.execute("INSERT INTO grids VALUES (?,1,50.0,5.0,5.0,130,NULL,1,1)", (uu.UUID(int=5000).hex,))
    con.commit(); con.close()
    rows = catalogue.filter_rows(catalogue.read_catalogue(fake_gpkg))
    gd = catalogue.build_grid_dict(rows, {})
    assert uu.UUID(int=5000).hex not in gd
