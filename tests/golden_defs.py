"""Shared definitions for the golden-image tests and their generator.

Golden images freeze (a) the built-in scene constants, (b) the camera
conventions, (c) the RNG stream layout, and (d) the tonemap (A.9) — any
change to those shows up as a byte diff (SURVEY.md §4 "Golden" row).
Kept tiny so cpu_ref renders them in seconds.
"""

from tpurt.config import RenderConfig

GOLDENS = {
    "g1-primary": RenderConfig(width=64, height=48, spp=2, seed=11,
                               scene="spheres_plane", mode="primary"),
    "g2-spheres-path": RenderConfig(width=64, height=48, spp=6, seed=11,
                                    scene="spheres_plane", mode="mega",
                                    max_depth=6),
    "g3-cornell": RenderConfig(width=48, height=48, spp=8, seed=11,
                               scene="cornell", mode="mega", max_depth=6),
    "g4-mesh": RenderConfig(width=64, height=48, spp=4, seed=11,
                            scene="blob", mesh_subdiv=2, mode="mega",
                            max_depth=5),
    "g5-rr": RenderConfig(width=48, height=36, spp=6, seed=11,
                          scene="spheres_plane", mode="mega",
                          max_depth=10, rr_start=2),
}
