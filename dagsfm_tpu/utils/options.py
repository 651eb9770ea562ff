"""Options manager: layered dataclass config with ini-project files.

TPU-native counterpart of /root/reference/src/util/option_manager.{h,cc}
(boost::program_options registry with per-module Add*Options bundles,
.ini project save/load at option_manager.h:71-75, and quality presets
:58-70). Here each module already defines a dataclass Options; this
module composes them, round-trips .ini project files, and applies the
reference's quality presets.
"""

from __future__ import annotations

import configparser
import dataclasses

from dagsfm_tpu.clustering.image_clustering import ClusteringOptions
from dagsfm_tpu.estimation.rotation_averaging import RAOptions
from dagsfm_tpu.sfm.incremental_mapper import MapperOptions
from dagsfm_tpu.sfm.track_selection import TrackSelectionOptions


@dataclasses.dataclass
class ProjectOptions:
    """The full option tree (ref OptionManager members)."""
    image_path: str = ""
    database_path: str = ""
    output_path: str = ""
    clustering: ClusteringOptions = dataclasses.field(
        default_factory=ClusteringOptions)
    mapper: MapperOptions = dataclasses.field(default_factory=MapperOptions)
    track_selection: TrackSelectionOptions = dataclasses.field(
        default_factory=TrackSelectionOptions)
    # RAOptions is a NamedTuple (jit-static); store as dict for mutation
    ra_l1_iterations: int = 10
    ra_irls_iterations: int = 100

    def ra_options(self) -> RAOptions:
        return RAOptions(l1_iterations=self.ra_l1_iterations,
                         irls_iterations=self.ra_irls_iterations)


# quality presets (ref option_manager.h ModifyFor*Quality)
_PRESETS = {
    "low": dict(max_num_features=512, num_ransac_hypotheses=128,
                ba_global_max_iterations=20),
    "medium": dict(max_num_features=1024, num_ransac_hypotheses=256,
                   ba_global_max_iterations=30),
    "high": dict(max_num_features=2048, num_ransac_hypotheses=512,
                 ba_global_max_iterations=50),
    "extreme": dict(max_num_features=4096, num_ransac_hypotheses=1024,
                    ba_global_max_iterations=75),
}


def apply_quality_preset(opts: ProjectOptions, quality: str) -> None:
    p = _PRESETS[quality]
    opts.mapper.num_ransac_hypotheses = p["num_ransac_hypotheses"]
    opts.mapper.ba_global_max_iterations = p["ba_global_max_iterations"]


def save_project(opts: ProjectOptions, path: str) -> None:
    """Write an ini project file (ref OptionManager::Write)."""
    cp = configparser.ConfigParser()
    cp["root"] = {
        "image_path": opts.image_path,
        "database_path": opts.database_path,
        "output_path": opts.output_path,
        "ra_l1_iterations": str(opts.ra_l1_iterations),
        "ra_irls_iterations": str(opts.ra_irls_iterations),
    }
    for section, dc in (("clustering", opts.clustering),
                        ("mapper", opts.mapper),
                        ("track_selection", opts.track_selection)):
        cp[section] = {f.name: str(getattr(dc, f.name))
                       for f in dataclasses.fields(dc)}
    with open(path, "w") as f:
        cp.write(f)


def load_project(path: str) -> ProjectOptions:
    """Read an ini project file (ref OptionManager::Read)."""
    cp = configparser.ConfigParser()
    cp.read(path)
    opts = ProjectOptions()
    root = cp["root"]
    opts.image_path = root.get("image_path", "")
    opts.database_path = root.get("database_path", "")
    opts.output_path = root.get("output_path", "")
    opts.ra_l1_iterations = int(root.get("ra_l1_iterations", "10"))
    opts.ra_irls_iterations = int(root.get("ra_irls_iterations", "100"))

    def fill(dc, section):
        if section not in cp:
            return
        for f in dataclasses.fields(dc):
            if f.name in cp[section]:
                raw = cp[section][f.name]
                if f.type in ("int", int):
                    setattr(dc, f.name, int(raw))
                elif f.type in ("float", float):
                    setattr(dc, f.name, float(raw))
                elif f.type in ("bool", bool):
                    setattr(dc, f.name, raw in ("True", "true", "1"))
                else:
                    setattr(dc, f.name, raw)

    fill(opts.clustering, "clustering")
    fill(opts.mapper, "mapper")
    fill(opts.track_selection, "track_selection")
    return opts
