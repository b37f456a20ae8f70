"""Fetch the reference's real datasets (BASELINE.json:7-11; SURVEY.md C13).

Downloads the four .mat datasets into ``data/<Name>/<name>.mat`` where the
registry (come_tpu/graphs/datasets.py) picks them up automatically —
replacing the offline SBM stand-ins with the real graphs the BASELINE
quality bar (NMI/macro-F1 parity on BlogCatalog) is defined on.

Network use is strictly opt-in/ambient: with no egress (this build
environment blackholes DNS) the script is a CLEAN NO-OP — it reports each
dataset as skipped and exits 0.

Integrity: every download is validated TWICE —
  1. sha256 against ``data/checksums.json``.  The file ships empty-by-
     default; on first successful fetch the hash is recorded
     (trust-on-first-use) and later fetches must match it.  If you have
     known-good hashes, put them in checksums.json before fetching.
  2. structurally: the loaded .mat must contain a sparse ``network`` of
     the published node count and a ``group`` matrix with the published
     community count (reference `utils/graph_utils.py::load_matfile` [R]
     keys) — a wrong or truncated file fails loudly.

Run:  python scripts/fetch_data.py [--only blogcatalog] [--timeout 30]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
DATA = REPO / "data"
CHECKSUMS = DATA / "checksums.json"

# Canonical public sources.  BlogCatalog/Flickr are Tang & Liu's
# social-dimension datasets (the reference's data/ lineage); Wikipedia is
# the node2vec POS co-occurrence graph; DBLP mirrors the reference repo's
# own data directory.
SOURCES = {
    "blogcatalog": {
        "urls": [
            "http://leitang.net/code/social-dimension/data/blogcatalog.mat",
            "https://github.com/phanein/deepwalk/raw/master/example_graphs/blogcatalog.mat",
        ],
        "dest": DATA / "BlogCatalog" / "blogcatalog.mat",
        "nodes": 10312,
        "communities": 39,
        # published edge count (Tang & Liu, social-dimension datasets):
        # 333,983 undirected edges; the .mat adjacency stores either E
        # (triangular) or 2E (symmetric) nonzeros
        "edges": 333983,
    },
    "flickr": {
        "urls": [
            "http://leitang.net/code/social-dimension/data/flickr.mat",
        ],
        "dest": DATA / "Flickr" / "flickr.mat",
        "nodes": 80513,
        "communities": 195,
        "edges": 5899882,  # published (social-dimension datasets)
    },
    "wikipedia": {
        "urls": [
            "http://snap.stanford.edu/node2vec/POS.mat",
        ],
        "dest": DATA / "Wikipedia" / "wikipedia.mat",
        "nodes": 4777,
        "communities": 40,
        # no edge pin: the POS graph is a WEIGHTED co-occurrence matrix
        # whose stored nnz (weights, possible diagonal) need not equal the
        # published edge count; pinning an unverified constant would
        # permanently reject the genuine file (V/C structure still checked)
    },
    "dblp": {
        "urls": [
            "https://raw.githubusercontent.com/andompesta/"
            "nodeembedding-to-communityembedding/master/data/Dblp/dblp.mat",
        ],
        "dest": DATA / "Dblp" / "dblp.mat",
        "nodes": 13184,
        "communities": 5,
    },
}


def _sha256(path: pathlib.Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _validate_mat(
    path: pathlib.Path,
    nodes: int,
    communities: int,
    edges: int | None = None,
) -> None:
    from scipy.io import loadmat
    from scipy.sparse import issparse

    mat = loadmat(str(path))
    net, grp = mat["network"], mat["group"]
    assert issparse(net), "network is not sparse"
    assert net.shape == (nodes, nodes), f"network shape {net.shape}"
    c = grp.shape[1]
    assert c == communities, f"group has {c} communities, want {communities}"
    if edges is not None:
        # the adjacency may store E (triangular) or 2E (symmetric) nnz;
        # either way it must match the PUBLISHED edge count exactly —
        # structure-only validation would pass a truncated or substituted
        # graph of the right shape (VERDICT r3 item 4)
        nnz = int(net.nnz)
        assert nnz in (edges, 2 * edges), (
            f"network has {nnz} nonzeros; published edge count {edges} "
            f"implies {edges} or {2 * edges}"
        )


def _fetch(
    name: str, spec: dict, timeout: float, sums: dict,
    require_pinned: bool = False,
) -> str:
    dest: pathlib.Path = spec["dest"]
    if require_pinned and name not in sums:
        raise RuntimeError(
            f"{name}: --require-pinned set but checksums.json has no hash "
            f"for it — add a known-good sha256 first"
        )
    if dest.exists():
        # integrity contract applies to pre-existing files too: a stale or
        # substituted file must not silently pass on structure alone
        if name in sums:
            digest = _sha256(dest)
            if sums[name] != digest:
                raise RuntimeError(
                    f"{name}: existing file sha256 mismatch (got {digest}, "
                    f"checksums.json has {sums[name]}) — delete "
                    f"{dest} and re-fetch"
                )
        _validate_mat(
            dest, spec["nodes"], spec["communities"], spec.get("edges")
        )
        return f"{name}: already present ({dest.relative_to(REPO)}) — valid"
    import urllib.error
    import urllib.request

    last_err = None
    for url in spec["urls"]:
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r:
                blob = r.read()
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            last_err = e
            continue
        dest.parent.mkdir(parents=True, exist_ok=True)
        with tempfile.NamedTemporaryFile(
            dir=dest.parent, delete=False
        ) as tmp:
            tmp.write(blob)
            tmppath = pathlib.Path(tmp.name)
        digest = _sha256(tmppath)
        if name in sums and sums[name] != digest:
            tmppath.unlink()
            raise RuntimeError(
                f"{name}: sha256 mismatch (got {digest}, "
                f"checksums.json has {sums[name]}) — refusing"
            )
        try:
            _validate_mat(
                tmppath, spec["nodes"], spec["communities"],
                spec.get("edges"),
            )
        except Exception as e:
            tmppath.unlink()
            raise RuntimeError(f"{name}: downloaded file invalid: {e}")
        tmppath.replace(dest)
        if name not in sums:
            sums[name] = digest  # trust-on-first-use; pinned thereafter
        return f"{name}: fetched {url} -> {dest.relative_to(REPO)} ({digest[:16]}…)"
    return f"{name}: OFFLINE/unreachable — skipped ({last_err})"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--only", choices=sorted(SOURCES), default=None)
    p.add_argument("--timeout", type=float, default=30.0)
    p.add_argument(
        "--require-pinned", action="store_true",
        help="refuse trust-on-first-use: every dataset must already have "
        "a sha256 in checksums.json (for provenance-controlled hosts)",
    )
    args = p.parse_args(argv)

    sums = {}
    if CHECKSUMS.exists():
        sums = json.loads(CHECKSUMS.read_text())
    names = [args.only] if args.only else sorted(SOURCES)
    for name in names:
        print(_fetch(name, SOURCES[name], args.timeout, sums,
                     args.require_pinned))
    CHECKSUMS.parent.mkdir(parents=True, exist_ok=True)
    CHECKSUMS.write_text(json.dumps(sums, indent=2, sort_keys=True) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
