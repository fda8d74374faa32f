"""Extract ``.tar.zst`` archives without depending on a system zstd.

The reference's bundled test tables (kernel/tests/data/*.tar.zst,
acceptance golden tables) are zstd-compressed tarballs. Boxes drift:
round 12's sandbox lost the ``unzstd`` binary, taking every
reference-corpus test down with it. This helper keeps the fast path
(system ``tar`` + ``unzstd``) and falls back to pyarrow's bundled zstd
codec streamed through :mod:`tarfile` — pure Python, no external binary,
always available since pyarrow is a hard dependency of this repo.
"""

from __future__ import annotations

import io
import os
import subprocess
import tarfile


def extract_tar_zst(tar_path: str, dest_root: str) -> None:
    """Extract ``tar_path`` (a .tar.zst) under ``dest_root``.

    Tries system ``tar --use-compress-program=unzstd`` first (fastest,
    preserves historical behavior), then falls back to
    pyarrow-decompressed :mod:`tarfile` extraction.
    """
    os.makedirs(dest_root, exist_ok=True)
    try:
        subprocess.run(
            ["tar", "--use-compress-program=unzstd", "-xf", tar_path],
            cwd=dest_root,
            check=True,
            capture_output=True,
        )
        return
    except (subprocess.CalledProcessError, FileNotFoundError):
        pass
    import pyarrow as pa

    with pa.CompressedInputStream(pa.OSFile(tar_path, "rb"), "zstd") as zin:
        # tarfile needs seekability for some member layouts; the archives
        # are test-table sized, so buffer the decompressed stream
        buf = io.BytesIO(zin.read())
    with tarfile.open(fileobj=buf, mode="r:") as tf:
        tf.extractall(dest_root, filter="tar")


def extract_table(data_dir: str, name: str, extract_root: str) -> str:
    """Extract ``{data_dir}/{name}.tar.zst`` into ``extract_root`` once
    (idempotent), drop Hadoop ``.crc`` droppings, return the table dir.

    The shared shape of every reference-corpus fixture loader.
    """
    plain = os.path.join(data_dir, name)
    if os.path.isdir(plain):
        return plain
    dest = os.path.join(extract_root, name)
    if not os.path.isdir(dest):
        extract_tar_zst(os.path.join(data_dir, f"{name}.tar.zst"), extract_root)
        for dirpath, _dirs, files in os.walk(dest):
            for f in files:
                if f.startswith(".") and f.endswith(".crc"):
                    os.unlink(os.path.join(dirpath, f))
    return dest
