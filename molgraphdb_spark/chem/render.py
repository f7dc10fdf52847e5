"""Pure-Python molecular depiction: SMILES → deterministic 2D layout →
RGB raster → PPM bytes — the raster leg of the reference's
visualisation pipeline (reference mcs.py:349–374: rdDepictor
Compute2DCoords → Draw.MolToImage(size=(300, 300)) → matplotlib
imshow) re-expressed without RDKit or matplotlib.

Every stage is INTEGER arithmetic (hex-ish lattice layout, integer
bounding-box scaling, Bresenham lines, 3×3 CPK atom marks), so the
raster is bit-deterministic across platforms, libm versions, and
rounds — the property that lets a constant VALUES oracle pin the
digests (the chem-family oracle discipline; FIXTURES.md).

Scope honesty: this is a SCHEMATIC depiction — graph-faithful (every
atom placed, every bond drawn, element-colored, bond order visible),
not IUPAC-aesthetic (rings render as the BFS lattice walks them, not
as regular polygons). Layout is deterministic in the PARSED atom
order; rewriting-invariance remains the identity layer's job
(mol_key), not the depiction's — same as the reference, whose RDKit
coordinates also vary with input atom order.
"""

from __future__ import annotations

import hashlib

from molgraphdb_spark.chem.mol import MolGraph, parse_smiles
from molgraphdb_spark.functions.codecs import encode_ppm

#: Canvas geometry (the reference draws 300×300).
CANVAS = 300
MARGIN = 12

#: Six integer lattice directions (pseudo-hexagonal: alternating them
#: produces the zig-zag chains of a chemical sketch).
_DIRS = [(4, 0), (2, -4), (-2, -4), (-4, 0), (-2, 4), (2, 4)]

#: CPK-ish element colors; anything unlisted renders dark magenta.
_CPK = {
    "C": (64, 64, 64),
    "N": (0, 0, 224),
    "O": (224, 0, 0),
    "S": (176, 176, 0),
    "P": (224, 112, 0),
    "F": (0, 160, 0),
    "Cl": (0, 160, 0),
    "Br": (128, 48, 0),
    "I": (96, 0, 160),
    "H": (160, 160, 160),
    "B": (224, 144, 144),
}
_OTHER = (144, 0, 144)


def layout_2d(mol: MolGraph) -> dict[int, tuple[int, int]]:
    """Deterministic integer lattice embedding: BFS from atom 0; each
    new atom takes the first FREE lattice point probing the six
    directions in a zig-zag preference order from its parent's
    incoming direction, doubling the step until free (so collisions
    never fail, they stretch). Ring-closure bonds connect
    already-placed atoms wherever they landed."""
    coords: dict[int, tuple[int, int]] = {}
    taken: set[tuple[int, int]] = set()
    if mol.n_atoms == 0:
        return coords
    coords[0] = (0, 0)
    taken.add((0, 0))
    in_dir: dict[int, int] = {0: 0}
    queue = [0]
    seen = {0}
    while queue:
        u = queue.pop(0)
        ux, uy = coords[u]
        d_in = in_dir[u]
        # zig-zag preference: continue-with-turn first (the sketch look)
        pref = [
            (d_in + 1) % 6, (d_in + 5) % 6, d_in,
            (d_in + 2) % 6, (d_in + 4) % 6, (d_in + 3) % 6,
        ]
        for v in mol.neighbors(u):
            if v in seen:
                continue
            placed = False
            for scale in range(1, 64):
                for d in pref:
                    dx, dy = _DIRS[d]
                    p = (ux + dx * scale, uy + dy * scale)
                    if p not in taken:
                        coords[v] = p
                        taken.add(p)
                        in_dir[v] = d
                        placed = True
                        break
                if placed:
                    break
            if not placed:  # pragma: no cover — 64×6 probes never all collide
                raise ValueError(f"layout failed for atom {v}")
            seen.add(v)
            queue.append(v)
    return coords


def _bresenham(x0: int, y0: int, x1: int, y1: int):
    """Classic integer line walk, endpoint-inclusive."""
    dx, dy = abs(x1 - x0), -abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx + dy
    while True:
        yield x0, y0
        if x0 == x1 and y0 == y1:
            return
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x0 += sx
        if e2 <= dx:
            err += dx
            y0 += sy


def _put(canvas: bytearray, x: int, y: int, rgb: tuple[int, int, int]) -> None:
    if 0 <= x < CANVAS and 0 <= y < CANVAS:
        o = (y * CANVAS + x) * 3
        canvas[o : o + 3] = bytes(rgb)


_BOND_RGB = (16, 16, 16)


def rasterize(mol: MolGraph, coords: dict[int, tuple[int, int]]) -> bytes:
    """Integer-scaled raster: bonds as Bresenham lines (double/triple
    bonds add parallel offset lines; aromatic 1.5 draws single — the
    schematic convention), atoms as 3×3 CPK blocks over the lines.
    Returns the raw RGB raster (CANVAS² × 3 bytes)."""
    canvas = bytearray(b"\xff" * (CANVAS * CANVAS * 3))
    if not coords:
        return bytes(canvas)
    xs = [p[0] for p in coords.values()]
    ys = [p[1] for p in coords.values()]
    xmin, xmax, ymin, ymax = min(xs), max(xs), min(ys), max(ys)
    span = CANVAS - 2 * MARGIN

    def sx(x: int) -> int:
        if xmax == xmin:
            return CANVAS // 2
        return MARGIN + (x - xmin) * span // (xmax - xmin)

    def sy(y: int) -> int:
        if ymax == ymin:
            return CANVAS // 2
        return MARGIN + (y - ymin) * span // (ymax - ymin)

    pix = {i: (sx(x), sy(y)) for i, (x, y) in coords.items()}
    for (a, b), order in sorted(mol.bonds.items()):
        (x0, y0), (x1, y1) = pix[a], pix[b]
        # parallel-offset direction: perpendicular-ish to the line
        off = (0, 1) if abs(x1 - x0) >= abs(y1 - y0) else (1, 0)
        lines = [(0, 0)]
        if order == 2.0:
            lines.append(off)
        elif order == 3.0:
            lines.append(off)
            lines.append((-off[0], -off[1]))
        for ox, oy in lines:
            for x, y in _bresenham(x0 + ox, y0 + oy, x1 + ox, y1 + oy):
                _put(canvas, x, y, _BOND_RGB)
    for i, (x, y) in pix.items():
        rgb = _CPK.get(mol.elements[i], _OTHER)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                _put(canvas, x + dx, y + dy, rgb)
    return bytes(canvas)


def render_ppm(smiles: str) -> tuple[int, int, int, int, str, bytes]:
    """Full pipeline: parse → layout → rasterize → PPM encode.
    Returns (n_atoms, n_bonds, ink_px, n_colors, raster_md5, ppm_bytes)
    — ink_px counts non-white pixels, n_colors the distinct non-white
    RGB values (atoms' element palette + the bond color), and the md5
    digests the complete PPM file."""
    mol = parse_smiles(smiles)
    raster = rasterize(mol, layout_2d(mol))
    ink = 0
    colors = set()
    for o in range(0, len(raster), 3):
        px = raster[o : o + 3]
        if px != b"\xff\xff\xff":
            ink += 1
            colors.add(bytes(px))
    data = encode_ppm(CANVAS, CANVAS, raster)
    return (
        mol.n_atoms,
        mol.n_bonds,
        ink,
        len(colors),
        hashlib.md5(data).hexdigest(),
        data,
    )
