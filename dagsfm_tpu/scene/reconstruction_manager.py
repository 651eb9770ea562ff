"""ReconstructionManager: an ordered collection of models.

TPU-native counterpart of /root/reference/src/base/reconstruction_manager.
{h,cc}: holds the (possibly multiple) models produced by a mapper run and
reads/writes them under the COLMAP `0/`, `1/`, ... directory layout.
"""

from __future__ import annotations

import os

from dagsfm_tpu.scene.reconstruction import Reconstruction


class ReconstructionManager:
    def __init__(self):
        self._recons: list[Reconstruction] = []

    def __len__(self) -> int:
        return len(self._recons)

    def __iter__(self):
        return iter(self._recons)

    def get(self, idx: int) -> Reconstruction:
        return self._recons[idx]

    def add(self, rec: Reconstruction | None = None) -> int:
        """Append a reconstruction (new empty one if None); returns index."""
        self._recons.append(rec if rec is not None else Reconstruction())
        return len(self._recons) - 1

    def delete(self, idx: int) -> None:
        del self._recons[idx]

    def clear(self) -> None:
        self._recons.clear()

    def largest(self) -> Reconstruction | None:
        """The model with the most registered images (ref: used to pick
        the result when not keeping multiple models)."""
        if not self._recons:
            return None
        return max(self._recons, key=lambda r: r.num_reg_images())

    def write(self, path: str, binary: bool = True) -> None:
        """Write all models under path/0, path/1, ... (ref Write)."""
        from dagsfm_tpu.scene import io as scene_io
        os.makedirs(path, exist_ok=True)
        for k, rec in enumerate(self._recons):
            sub = os.path.join(path, str(k))
            os.makedirs(sub, exist_ok=True)
            if binary:
                scene_io.write_model_bin(rec, sub)
            else:
                scene_io.write_model_text(rec, sub)

    @classmethod
    def read(cls, path: str) -> "ReconstructionManager":
        """Load all models from path/0, path/1, ... (ref Read)."""
        from dagsfm_tpu.scene import io as scene_io
        mgr = cls()
        k = 0
        while True:
            sub = os.path.join(path, str(k))
            if not os.path.isdir(sub):
                break
            try:
                mgr.add(scene_io.read_model_bin(sub))
            except FileNotFoundError:
                mgr.add(scene_io.read_model_text(sub))
            k += 1
        return mgr
