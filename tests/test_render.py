"""Goldens for the pure-Python molecular rasterizer (chem/render.py)
— the raster leg of the reference's visualisation pipeline
(mcs.py:349–374), anchored by pixel counts derived from FIRST
PRINCIPLES (no rendering involved in the expectation), plus
determinism, structure sensitivity, and graph-fidelity properties."""

from __future__ import annotations

import hashlib

from molgraphdb_spark.chem.mol import parse_smiles
from molgraphdb_spark.chem.render import (
    CANVAS,
    MARGIN,
    layout_2d,
    rasterize,
    render_ppm,
)
from molgraphdb_spark.functions.codecs import decode_ppm


def test_methane_hand_golden():
    # single atom → one 3×3 CPK block centered: exactly 9 ink pixels,
    # one color
    n_atoms, n_bonds, ink, n_colors, _md5, data = render_ppm("C")
    assert (n_atoms, n_bonds) == (1, 0)
    assert ink == 9
    assert n_colors == 1
    # and the PPM is a valid file our own decoder accepts
    w, h, maxval, raster = decode_ppm(data)
    assert (w, h, maxval) == (CANVAS, CANVAS, 255)


def test_ethane_hand_golden():
    # Derivation (no rendering): atoms at lattice (0,0) and (4,0) →
    # scaled x = MARGIN=12 and CANVAS-MARGIN=288, y centered at 150.
    # Bond line: 277 pixels (x 12..288 inclusive, y 150). Each 3×3
    # block spans x±1/y±1 around its center; block A (x 11..13)
    # overlaps the line at x∈{12,13} (x=11 is off-line), so each block
    # adds 9−2 = 7 new pixels. Union = 277 + 7 + 7 = 291.
    n_atoms, n_bonds, ink, n_colors, _md5, _data = render_ppm("CC")
    assert (n_atoms, n_bonds) == (2, 1)
    assert ink == 277 + 7 + 7
    assert n_colors == 2  # carbon gray + bond color


def test_double_bond_draws_parallel_line():
    # C=C draws the same geometry twice with a 1-px offset: strictly
    # more ink than C-C, less than 2× (blocks overlap both lines)
    single = render_ppm("CC")[2]
    double = render_ppm("C=C")[2]
    assert single < double < 2 * single


def test_render_deterministic():
    a = render_ppm("O=C(C)Oc1ccccc1C(=O)O")
    b = render_ppm("O=C(C)Oc1ccccc1C(=O)O")
    assert a == b


def test_layout_places_every_atom_distinctly():
    for smi in ["CCCC", "c1ccccc1", "CC(C)(C)C", "C1CC1C(=O)O"]:
        mol = parse_smiles(smi)
        coords = layout_2d(mol)
        assert len(coords) == mol.n_atoms
        assert len(set(coords.values())) == mol.n_atoms  # no collisions


def test_heteroatoms_get_distinct_colors():
    # C, N, O + bond color = 4 distinct colors
    assert render_ppm("NCC=O")[3] == 4


def test_ring_closure_bond_is_drawn():
    # cyclobutane vs butane: same atom count, one extra bond — the
    # closure line must add ink
    ring = render_ppm("C1CCC1")
    chain = render_ppm("CCCC")
    assert ring[1] == chain[1] + 1  # n_bonds
    assert ring[2] > chain[2]       # closure line adds ink


def test_raster_md5_covers_whole_ppm_file():
    # the digest is over header + raster — a dimension change would
    # change it even with identical ink
    *_, md5, data = render_ppm("CC")
    assert hashlib.md5(data).hexdigest() == md5
    assert data[:2] == b"P6"


def test_blank_canvas_is_white():
    mol = parse_smiles("C")
    raster = rasterize(mol, {})
    assert raster == b"\xff" * (CANVAS * CANVAS * 3)
    assert MARGIN > 1  # blocks at the margin stay fully on-canvas
