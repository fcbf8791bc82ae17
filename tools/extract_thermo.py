"""Extract the published Turner-2004 nearest-neighbor thermodynamic constants
into priblast_tpu/data/thermo.npz.

These are physical constants (see http://www.cs.ubc.ca/labs/beta/Projects/RNA-Params,
also shipped with ViennaRNA and RIblast). We parse them out of the reference's
data headers (`/root/reference/src/energy_par.hpp`, `intloops.hpp`) once and
store them as packed numpy arrays; the framework only ever loads the npz.

Run: python tools/extract_thermo.py [reference_src_dir]
"""

import re
import sys
from pathlib import Path

import numpy as np

INF = 1000000


def _parse_braces(body: str, pos: int):
    """Parse a C brace initializer into nested python lists (ints at leaves)."""
    assert body[pos] == "{"
    pos += 1
    items = []
    while True:
        while pos < len(body) and body[pos] in " \t\n,":
            pos += 1
        c = body[pos]
        if c == "}":
            return items, pos + 1
        if c == "{":
            sub, pos = _parse_braces(body, pos)
            items.append(sub)
        else:
            m = re.match(r"-?\d+", body[pos:])
            items.append(int(m.group(0)))
            pos += m.end()


def _fill(arr: np.ndarray, items) -> None:
    """Apply C aggregate-initialization semantics: missing elements are 0."""
    for i, it in enumerate(items):
        if isinstance(it, list):
            _fill(arr[i], it)
        else:
            # scalar at a non-leaf level only happens as `{0}`-style zero fill
            if arr.ndim == 0:
                arr[...] = it
            else:
                arr.reshape(-1)[i] = it


def parse_int_array(text: str, name: str, shape) -> np.ndarray:
    """Parse `static int name[..]..= {...};` into an ndarray of `shape`,
    honoring C partial-initialization (unspecified entries are zero)."""
    m = re.search(
        r"(?:static\s+)?int\s+" + re.escape(name) + r"\s*(?:\[[^\]]*\])+\s*=",
        text,
    )
    if not m:
        raise KeyError(name)
    start = text.index("{", m.end())
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                end = i + 1
                break
    body = text[start:end]
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    body = re.sub(r"//[^\n]*", "", body)
    body = body.replace("INF", str(INF))
    items, _ = _parse_braces(body, body.index("{"))
    arr = np.zeros(shape, dtype=np.int32)
    if items and not isinstance(items[0], list):
        arr.reshape(-1)[: len(items)] = items
    else:
        _fill(arr, items)
    return arr


def parse_int_scalar(text: str, name: str) -> int:
    m = re.search(r"(?:static\s+)?int\s+" + re.escape(name) + r"\s*=\s*(-?\d+)", text)
    if not m:
        raise KeyError(name)
    return int(m.group(1))


def main(src_dir: str) -> None:
    src = Path(src_dir)
    ep = (src / "energy_par.hpp").read_text()
    il = (src / "intloops.hpp").read_text()

    out = {
        "BP_pair": parse_int_array(ep, "BP_pair", (5, 5)),
        "rtype": parse_int_array(ep, "rtype", (7,)),
        "hairpin37": parse_int_array(ep, "hairpin37", (31,)),
        "mismatchH37": parse_int_array(ep, "mismatchH37", (7, 5, 5)),
        "mismatchI37": parse_int_array(ep, "mismatchI37", (7, 5, 5)),
        "stack37": parse_int_array(ep, "stack37", (7, 7)),
        "bulge37": parse_int_array(ep, "bulge37", (31,)),
        "internal_loop37": parse_int_array(ep, "internal_loop37", (31,)),
        "dangle5_37": parse_int_array(ep, "dangle5_37", (8, 5)),
        "dangle3_37": parse_int_array(ep, "dangle3_37", (8, 5)),
        "int11_37": parse_int_array(il, "int11_37", (8, 8, 5, 5)),
        "int21_37": parse_int_array(il, "int21_37", (8, 8, 5, 5, 5)),
        "int22_37": parse_int_array(il, "int22_37", (8, 8, 5, 5, 5, 5)),
        "TerminalAU": np.int32(parse_int_scalar(ep, "TerminalAU")),
        "ML_closing37": np.int32(parse_int_scalar(ep, "ML_closing37")),
        "ML_intern37": np.int32(parse_int_scalar(ep, "ML_intern37")),
        "ML_BASE37": np.int32(parse_int_scalar(ep, "ML_BASE37")),
        "MAX_NINIO": np.int32(parse_int_scalar(ep, "MAX_NINIO")),
        "F_ninio37": np.int32(parse_int_scalar(ep, "F_ninio37")),
        "lxc37": np.float64(107.856),
        "temperature": np.int32(37),
    }

    dest = Path(__file__).resolve().parent.parent / "priblast_tpu" / "data" / "thermo.npz"
    dest.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({dest.stat().st_size} bytes)")
    for k, v in out.items():
        if isinstance(v, np.ndarray):
            print(f"  {k}: shape={v.shape}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src")
