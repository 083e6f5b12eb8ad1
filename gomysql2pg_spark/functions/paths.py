"""Private per-user scratch directories that are actually private.

`os.makedirs(path, mode=0o700, exist_ok=True)` applies the mode only
when it CREATES the directory — a pre-existing directory (or a symlink
to one) planted at a predictable path by another local user is silently
accepted, and everything staged inside it (COPY dump trees, ANN index
trees with their `_SUCCESS` trust markers) becomes attacker-readable
and attacker-writable. Every fixed-path cache in the engine therefore
goes through `secure_private_dir`, which refuses anything that is not a
real directory owned by the calling user and re-tightens a loose mode.
"""

from __future__ import annotations

import os
import stat


def secure_private_dir(path: str) -> str:
    """mkdir -p `path` as a 0700 per-user private dir, verifying we
    actually own what ends up there.

    Raises RuntimeError if the path is a symlink or owned by a
    different uid (the pre-creation squat the predictable name
    invites); chmods a loose mode back to 0700 when the dir is ours.
    TOCTOU between the check and later use is out of scope — the
    threat model is the lazy pre-creation squat, not a root-capable
    attacker."""
    os.makedirs(path, mode=0o700, exist_ok=True)
    st = os.lstat(path)
    if stat.S_ISLNK(st.st_mode) or not stat.S_ISDIR(st.st_mode):
        raise RuntimeError(
            f"refusing scratch path {path!r}: not a real directory"
        )
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        raise RuntimeError(
            f"refusing scratch path {path!r}: owned by uid {st.st_uid}, "
            f"not us ({os.getuid()}) — pre-created by another user?"
        )
    if stat.S_IMODE(st.st_mode) != 0o700 and hasattr(os, "getuid"):
        os.chmod(path, 0o700)
    return path
