"""Pipeline facade + state machine.

Re-implements the reference's Pipeline (reference src/pipeline/
pipeline.cpp, pipeline.hpp:18-59) and its 12-state usm state machine
(reference types/pipeline_state.hpp:9-23, transitions pipeline.cpp:387-419)
as a plain Python state machine driving batched device stages.

The INITIAL_PROCESSING software pipelining (pipeline.cpp:548-556: batch N
loads while N-1 links and N-2 relaxes) maps to staggered id queues across
iterate_once calls: host decode threads overlap the device work of the
previous batch.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from opencalibration_tpu.geo.geo_coord import GeoCoord
from opencalibration_tpu.pipeline.stages import (
    LinkStage,
    LoadStage,
    RelaxStage,
)
from opencalibration_tpu.relax.problem_builder import RelaxOptions
from opencalibration_tpu.types.camera import CameraModel
from opencalibration_tpu.types.graph import MeasurementGraph, SurfaceModel
from opencalibration_tpu.utils import performance
from opencalibration_tpu.utils.performance import PerformanceMeasure


class PipelineState:
    INITIAL_PROCESSING = "INITIAL_PROCESSING"
    MESH_REFINEMENT = "MESH_REFINEMENT"
    INITIAL_GLOBAL_RELAX = "INITIAL_GLOBAL_RELAX"
    CAMERA_PARAMETER_RELAX = "CAMERA_PARAMETER_RELAX"
    FINAL_GLOBAL_RELAX = "FINAL_GLOBAL_RELAX"
    GENERATE_THUMBNAIL = "GENERATE_THUMBNAIL"
    DENSIFY_MESH = "DENSIFY_MESH"
    DENSE_MESH_RELAX = "DENSE_MESH_RELAX"
    GENERATE_LAYERS = "GENERATE_LAYERS"
    COLOR_BALANCE = "COLOR_BALANCE"
    BLEND_LAYERS = "BLEND_LAYERS"
    COMPLETE = "COMPLETE"

    ORDER = [
        INITIAL_PROCESSING, MESH_REFINEMENT, INITIAL_GLOBAL_RELAX,
        CAMERA_PARAMETER_RELAX, FINAL_GLOBAL_RELAX, GENERATE_THUMBNAIL,
        DENSIFY_MESH, DENSE_MESH_RELAX, GENERATE_LAYERS, COLOR_BALANCE,
        BLEND_LAYERS, COMPLETE,
    ]

    # states whose handler may return "REPEAT" (self-loop) — the committed
    # docs/pipeline_states.dot is generated from this and validated in CI
    # (the reference validates its pipeline.cpp.dot the same way)
    REPEATABLE = {
        INITIAL_PROCESSING, MESH_REFINEMENT, INITIAL_GLOBAL_RELAX,
        CAMERA_PARAMETER_RELAX, FINAL_GLOBAL_RELAX,
    }

    @classmethod
    def transition_dot(cls) -> str:
        """GraphViz dot of the state machine: linear NEXT chain through
        ORDER plus REPEAT self-loops (reference pipeline.cpp.dot)."""
        lines = ["digraph pipeline_states {", "  rankdir=TB;"]
        for a, b in zip(cls.ORDER, cls.ORDER[1:]):
            lines.append(f"  {a} -> {b};")
        for s in cls.ORDER:
            if s in cls.REPEATABLE:
                lines.append(f"  {s} -> {s} [label=\"REPEAT\"];")
        lines.append("}")
        return "\n".join(lines) + "\n"


RELAX_MAX_ITERATIONS = 5  # reference pipeline.cpp:39
FINAL_RELAX_MAX_ITERATIONS = 3  # reference pipeline.cpp:40

# stage weights for global progress (reference pipeline.cpp:485-520)
_STAGE_WEIGHTS = {
    PipelineState.INITIAL_PROCESSING: 10.0,
    PipelineState.MESH_REFINEMENT: 1.0,
    PipelineState.INITIAL_GLOBAL_RELAX: 3.0,
    PipelineState.CAMERA_PARAMETER_RELAX: 3.0,
    PipelineState.FINAL_GLOBAL_RELAX: 3.0,
    PipelineState.GENERATE_THUMBNAIL: 1.0,
    PipelineState.DENSIFY_MESH: 2.0,
    PipelineState.DENSE_MESH_RELAX: 2.0,
    PipelineState.GENERATE_LAYERS: 4.0,
    PipelineState.COLOR_BALANCE: 1.0,
    PipelineState.BLEND_LAYERS: 4.0,
    PipelineState.COMPLETE: 0.0,
}


@dataclasses.dataclass
class StepCompletionInfo:
    """Progress payload (reference pipeline/progress.hpp:36-52)."""

    state: str
    state_iteration: int
    loaded_ids: List[int]
    linked_ids: List[int]
    relaxed_ids: List[int]
    queue_size_remaining: int
    activity: str
    global_progress: float
    local_progress: float
    surfaces_updated: bool = False
    # live tile preview during ortho generation
    # (reference pipeline/progress.hpp:15-34 TileUpdate)
    tile_update: Optional[dict] = None


class Pipeline:
    """reference pipeline.hpp:18-59 public surface."""

    def __init__(self, batch_size: int = 10, parallelism: int = 8):
        self.batch_size = batch_size
        self.parallelism = parallelism
        self.overlap_io = True  # heterogeneous host/device overlap (see below)
        self.graph: MeasurementGraph = MeasurementGraph(seed=0)
        self.geocoord = GeoCoord()
        self.model_store: Dict[int, CameraModel] = {}
        self._model_key_to_id: Dict[tuple, int] = {}
        self.gps_positions: Dict[int, np.ndarray] = {}
        self.surfaces: List[SurfaceModel] = []

        self._add_queue: List[str] = []
        self._state = PipelineState.INITIAL_PROCESSING
        self._state_run_count = 0

        self._load_stage = LoadStage()
        self._link_stage = LinkStage()
        self._relax_stage = RelaxStage()

        self._prev_loaded_ids: List[int] = []
        self._prev_linked_ids: List[int] = []

        # problem-structure cache across REPEAT iterations of one relax
        # state (see stages.RelaxPlan / problem_builder.refresh_problem)
        self._relax_plan = None
        self._edges_version = 0  # bumped when edge inlier sets change

        self.step_callback: Optional[Callable[[StepCompletionInfo], None]] = None

        # stage-skip flags (reference pipeline.cpp:102-106 defaults)
        self.skip_initial_global_relax = True
        self.skip_camera_param_relax = False
        self.skip_final_global_relax = False
        self.skip_mesh_refinement = False
        self.skip_dense_mesh = True

        # ortho output configuration (reference Pipeline set_* setters)
        self.ortho_path: Optional[str] = None
        self.dsm_path: Optional[str] = None
        self.camera_id_path: Optional[str] = None
        self.thumbnail_path: Optional[str] = None
        self.textured_obj_prefix: Optional[str] = None
        self.ortho_max_megapixels: float = 64.0
        self.generate_thumbnails = True
        self.thumbnail_mosaic = None
        self._ortho_job = None

    # --- public API -------------------------------------------------------
    def add(self, paths: Sequence[str]):
        self._add_queue.extend(paths)

    def get_state(self) -> str:
        return self._state

    def state_run_count(self) -> int:
        return self._state_run_count

    def reset_state(self, state: str, run_count: int = 0):
        self._state = state
        self._state_run_count = run_count

    def resume_from_state(self, target: str) -> bool:
        """Rewind-only guard (reference pipeline.cpp:304-320)."""
        order = PipelineState.ORDER
        if order.index(target) <= order.index(self._state):
            self._state = target
            self._state_run_count = 0
            return True
        return False

    def save_checkpoint(self, directory: str) -> bool:
        from opencalibration_tpu.io.checkpoint import save_checkpoint

        return save_checkpoint(directory, self)

    def load_checkpoint(self, directory: str) -> bool:
        from opencalibration_tpu.io.checkpoint import load_checkpoint

        return load_checkpoint(directory, self)

    # Clear JIT caches when the process nears the kernel's memory-map
    # limit (vm.max_map_count, typically 65530): every XLA:CPU LM compile
    # costs ~400 maps, and a full multi-tier calibration compiles hundreds
    # of modules — past the limit LLVM dies with 'Cannot allocate memory'.
    _MAPS_CLEAR_THRESHOLD = 40000

    def _maybe_clear_jit_caches(self):
        try:
            with open("/proc/self/maps") as f:
                n = sum(1 for _ in f)
        except OSError:
            return
        if n > self._MAPS_CLEAR_THRESHOLD:
            import jax

            jax.clear_caches()

    def iterate_once(self) -> str:
        state = self._state
        handler = getattr(self, "_run_" + state.lower())
        self._maybe_clear_jit_caches()
        performance.set_compile_scope(state)
        with PerformanceMeasure(f"state {state}"):
            transition = handler()
        if transition == "NEXT":
            idx = PipelineState.ORDER.index(state)
            self._state = PipelineState.ORDER[min(idx + 1, len(PipelineState.ORDER) - 1)]
            self._state_run_count = 0
            self._relax_plan = None  # cache is per-state
        elif transition == "REPEAT":
            self._state_run_count += 1
        return self._state

    def run_to_completion(self, max_iterations: int = 10000) -> str:
        for _ in range(max_iterations):
            if self._state == PipelineState.COMPLETE:
                break
            self.iterate_once()
        return self._state

    # --- progress ---------------------------------------------------------
    def _emit(self, loaded, linked, relaxed, activity, local=1.0,
              surfaces_updated=False, tile_update=None):
        if self.step_callback is None:
            return
        order = PipelineState.ORDER
        total = sum(_STAGE_WEIGHTS.values())
        done = sum(_STAGE_WEIGHTS[s] for s in order[: order.index(self._state)])
        current = _STAGE_WEIGHTS.get(self._state, 0.0) * max(0.0, min(1.0, local))
        self.step_callback(
            StepCompletionInfo(
                state=self._state,
                state_iteration=self._state_run_count,
                loaded_ids=list(loaded),
                linked_ids=list(linked),
                relaxed_ids=list(relaxed),
                queue_size_remaining=len(self._add_queue),
                activity=activity,
                global_progress=(done + current) / total,
                local_progress=local,
                surfaces_updated=surfaces_updated,
                tile_update=tile_update,
            )
        )

    # --- states -----------------------------------------------------------
    def _run_initial_processing(self) -> str:
        batch = self._add_queue[: self.batch_size]
        self._add_queue = self._add_queue[len(batch):]

        self._load_stage.init(batch)
        self._link_stage.init(self.graph, self.gps_positions, self._prev_loaded_ids)
        self._relax_stage.init(
            self.graph, self._prev_linked_ids, self.gps_positions,
            self.model_store, relax_all=False, disable_parallelism=False,
            options=RelaxOptions(orientation=True, ground_plane=True),
        )

        # heterogeneous overlap (reference interleave, pipeline.cpp:548-556):
        # batch N decodes on host threads WHILE the device relaxes batch N-2
        # (dispatched async, joined last) and batch N-1's link does its host
        # match prep; the device extraction joins afterwards. Three stages of
        # consecutive batches are in flight at once, like the reference's
        # interleaved runner list. overlap_io=False forces the serial order
        # (for A/B benchmarks).
        if self.overlap_io:
            self._load_stage.start_decode(self.parallelism)
            with PerformanceMeasure("ip: relax dispatch"):
                self._relax_stage.dispatch(self.graph, self.surfaces)
            with PerformanceMeasure("ip: link run"):
                self._link_stage.run(self.graph, self.model_store)
            with PerformanceMeasure("ip: relax run"):
                self._relax_stage.join()
            with PerformanceMeasure("ip: load finish"):
                self._load_stage.finish()
        else:
            with PerformanceMeasure("ip: load run"):
                self._load_stage.run(self.parallelism)
            with PerformanceMeasure("ip: link run"):
                self._link_stage.run(self.graph, self.model_store)
            with PerformanceMeasure("ip: relax run"):
                self._relax_stage.run_all(self.graph, self.surfaces)

        with PerformanceMeasure("ip: load finalize"):
            loaded = self._load_stage.finalize(
                self.graph, self.geocoord, self.model_store,
                self._model_key_to_id, self.gps_positions,
            )
        with PerformanceMeasure("ip: link finalize"):
            linked = self._link_stage.finalize(self.graph)
        with PerformanceMeasure("ip: relax finalize"):
            relaxed = self._relax_stage.finalize(self.graph, self.model_store)
        new_surfaces = [
            s for s in self._relax_stage.surfaces() if s.mesh is not None or s.cloud
        ]
        if new_surfaces:
            self.surfaces = self._merge_group_surfaces(new_surfaces)

        total = self.graph.size_nodes() + len(self._add_queue)
        local = self.graph.size_nodes() / total if total else 1.0
        self._emit(loaded, linked, relaxed, "initial processing", local)

        self._prev_loaded_ids = loaded
        self._prev_linked_ids = linked
        if self._add_queue or loaded or linked:
            return "REPEAT"
        return "NEXT"

    # mesh-refinement constants (reference pipeline.cpp:676-679)
    _MESH_MAX_POINTS_PER_TRIANGLE = 20
    _MESH_VARIANCE_GSD_MULTIPLIER = 2.0
    _MESH_BASE_GRID_FRACTION = 0.1
    _MESH_MAX_GRID_LEVELS = 3
    # LM budget per refinement REPEAT: each level re-solves the same
    # cached problem structure with warm-started trust region, so a
    # bounded continuation per pass converges across REPEATs instead of
    # paying a full 100-iteration solve per pass (the reference bounds
    # each level's relax-refine loop the same way, pipeline.cpp:38,666)
    _MESH_REFINE_LM_BUDGET = 30

    def _mesh_gsd(self, grid_fraction: float):
        """Mean ground-sample distance + the level's minimum triangle size
        (reference pipeline.cpp:717-752)."""
        surf_z, n = 0.0, 0
        for s in self.surfaces:
            if s.mesh is not None and s.mesh.num_vertices > 0:
                z = s.mesh.vertices[:, 2]
                z = z[np.isfinite(z)]
                surf_z += float(z.sum())
                n += len(z)
        surf_z = surf_z / n if n else 0.0
        cam_z, arc, size, count = 0.0, 0.0, 0.0, 0
        for nid, node in self.graph.nodes():
            model = self.model_store.get(node.payload.model_id)
            if model is None:
                continue
            f = float(np.asarray(model.focal_length_pixels))
            if f <= 0 or not np.isfinite(node.payload.position).all():
                continue
            cam_z += float(node.payload.position[2])
            arc += 1.0 / f
            size += max(float(model.pixels_cols), float(model.pixels_rows))
            count += 1
        if count == 0:
            return 0.01, 0.0
        cam_z, arc, size = cam_z / count, arc / count, size / count
        gsd = max(0.001, abs(cam_z - surf_z) * arc)
        reduced = (
            math.sqrt(self._MESH_MAX_POINTS_PER_TRIANGLE / 8.0)
            * grid_fraction * size * gsd
        )
        return gsd, reduced

    def _run_mesh_refinement(self) -> str:
        """Interleaved relax-and-refine with a grid-fraction level
        schedule (reference pipeline.cpp:666-820): start from a minimal
        mesh, then repeat [ground-mesh relax at the level's grid fraction
        -> one refineByPointDensity pass gated on (2 x GSD)^2 plane
        variance], advancing to a finer level when refinement converges —
        this is what gives intrinsics calibration a mesh that can actually
        represent the terrain."""
        if self.skip_mesh_refinement:
            return "NEXT"
        from opencalibration_tpu.surface.mesh import build_minimal_mesh
        from opencalibration_tpu.surface.refine import refine_by_point_density

        rc = self._state_run_count
        if rc == 0:
            self._mesh_grid_level = 0
            self._mesh_level_triangles = 0
            cams = np.stack(
                [
                    np.asarray(node.payload.position)
                    for _, node in self.graph.nodes()
                    if np.isfinite(node.payload.position).all()
                ]
            ) if self.graph.size_nodes() else np.zeros((0, 3))
            prior = None
            clouds = [c for s in self.surfaces for c in s.cloud]
            if clouds:
                prior = np.concatenate(clouds)
            if len(cams) >= 2:
                mesh = build_minimal_mesh(cams, prior_z_points=prior)
                if mesh is not None:
                    self.surfaces = [SurfaceModel(cloud=[], mesh=mesh)]

        frac = self._MESH_BASE_GRID_FRACTION / (2.0 ** self._mesh_grid_level)
        self._relax_stage.max_lm_iterations = self._MESH_REFINE_LM_BUDGET
        try:
            self._global_relax(
                RelaxOptions(
                    orientation=True, ground_mesh=True, grid_fraction=frac
                ),
                None, False,
            )
        finally:
            self._relax_stage.max_lm_iterations = None
        if not self.surfaces:
            return "NEXT"

        gsd, reduced = self._mesh_gsd(frac)
        min_var = (self._MESH_VARIANCE_GSD_MULTIPLIER * gsd) ** 2
        created = 0
        refined_surfaces = []
        for s in self.surfaces:
            if s.mesh is None or not s.cloud:
                refined_surfaces.append(s)
                continue
            pts = np.concatenate(s.cloud)
            refined = refine_by_point_density(
                s.mesh, pts, self._MESH_MAX_POINTS_PER_TRIANGLE,
                min_distance_variance=min_var, max_iterations=1,
                min_triangle_size=reduced,
            )
            created += refined.num_triangles - s.mesh.num_triangles
            refined_surfaces.append(SurfaceModel(cloud=s.cloud, mesh=refined))
        self.surfaces = refined_surfaces
        self._emit([], [], [], f"mesh refinement L{self._mesh_grid_level}",
                   surfaces_updated=True)

        if rc >= RELAX_MAX_ITERATIONS * (self._MESH_MAX_GRID_LEVELS + 1):
            return "NEXT"  # global safety cap
        if created > 0:
            self._mesh_level_triangles += created
            return "REPEAT"
        if (
            self._mesh_level_triangles == 0
            or self._mesh_grid_level >= self._MESH_MAX_GRID_LEVELS
        ):
            return "NEXT"  # a whole level converged without any refinement
        self._mesh_grid_level += 1
        self._mesh_level_triangles = 0
        return "REPEAT"

    def _relax_structure_key(self, options: RelaxOptions, trim, last) -> tuple:
        """Cache key for the relax problem STRUCTURE: anything that changes
        measurement selection, block families, or group membership. Values
        (poses, mesh z, intrinsics) are refreshed on reuse instead."""
        mesh_topo = tuple(
            (s.mesh.num_vertices, s.mesh.num_triangles)
            for s in self.surfaces
            if s.mesh is not None
        )
        # radial_tier is NOT structural: the monotonicity prior is always
        # built when any_intrinsics and gated by weight, so the whole
        # 6-tier camera-parameter schedule reuses one problem structure
        struct = (
            options.ground_mesh, options.ground_plane, options.points_3d,
            options.any_intrinsics,
            options.minimal_mesh, round(options.grid_fraction, 9),
        )
        return (
            self._state, self.graph.size_nodes(), self.graph.size_edges(),
            self._edges_version, mesh_topo, struct, trim, last,
        )

    def _global_relax(self, options: RelaxOptions, trim: Optional[int], last: bool) -> List[int]:
        # NOTE: intrinsics tiers deliberately share one compiled LM module
        # (the Brown tier / principal toggles live in the free-mask ARRAY,
        # not the block structure) — do not clear jit caches on option
        # changes; _maybe_clear_jit_caches bounds cache growth instead.
        key = self._relax_structure_key(options, trim, last)
        plan = (
            self._relax_plan
            if self._relax_plan is not None and self._relax_plan.key == key
            else None
        )
        if plan is not None:
            self._relax_stage.reuse_plan(plan, self.graph, self.model_store, options)
        else:
            self._relax_stage.init(
                self.graph, [], self.gps_positions, self.model_store,
                relax_all=True, disable_parallelism=last, options=options,
            )
            if trim is not None:
                self._relax_stage.trim_groups(trim)
        self._relax_stage.run_all(self.graph, self.surfaces)
        # edge refits are deferred to state exit (one per state)
        relaxed = self._relax_stage.finalize(self.graph, self.model_store, refit=False)
        new_plan = self._relax_stage.last_plan
        if new_plan is not None and (options.ground_mesh or options.ground_plane):
            new_plan.key = key
            self._relax_plan = new_plan
        else:
            self._relax_plan = None
        surfaces = [
            s for s in self._relax_stage.surfaces() if s.mesh is not None or s.cloud
        ]
        if surfaces:
            self.surfaces = self._merge_group_surfaces(surfaces)
        return relaxed

    @staticmethod
    def _merge_group_surfaces(surfaces: List[SurfaceModel]) -> List[SurfaceModel]:
        """Per-group surfaces over the SAME mesh topology merge into one,
        vertex positions weighted by each group's point support
        (reference relax_stage.cpp:150-157 -> mergeSurfaceModels)."""
        if len(surfaces) <= 1:
            return surfaces
        from opencalibration_tpu.surface.refine import merge_surface_models

        merged = merge_surface_models(surfaces)
        return [merged] if merged is not None else surfaces

    def _run_initial_global_relax(self) -> str:
        if self.skip_initial_global_relax:
            return "NEXT"
        relaxed = self._global_relax(
            RelaxOptions(orientation=True, ground_mesh=True), None, False
        )
        self._emit([], [], relaxed, "initial global relax", surfaces_updated=True)
        return "NEXT" if self._state_run_count >= RELAX_MAX_ITERATIONS else "REPEAT"

    def _run_camera_parameter_relax(self) -> str:
        if self.skip_camera_param_relax:
            return "NEXT"
        # option schedule by run count (reference pipeline.cpp:601-631)
        rc = self._state_run_count
        if rc <= 1:
            options = RelaxOptions(orientation=True, ground_mesh=True, focal=True)
        elif rc == 2:
            options = RelaxOptions(
                orientation=True, ground_mesh=True, focal=True, radial_tier=1
            )
        elif rc == 3:
            options = RelaxOptions(
                orientation=True, ground_mesh=True, focal=True, radial_tier=2
            )
        else:
            options = RelaxOptions(
                orientation=True, ground_mesh=True, focal=True,
                principal=True, radial_tier=3,
            )
        # The reference calibrates intrinsics on the single biggest group
        # only (trim_groups(1), pipeline.cpp:634). Here ALL groups
        # participate: the batched solver couples the shared intrinsics
        # tail across groups exactly (psum-Schur, group_solver.py), so
        # calibration uses the whole survey's measurements.
        relaxed = self._global_relax(options, trim=None, last=False)
        self._emit([], [], relaxed, "camera parameter relax", surfaces_updated=True)
        if self._state_run_count >= RELAX_MAX_ITERATIONS:
            # ONE deferred maximum-likelihood edge refit with the final
            # intrinsics (the reference refits per finalize,
            # relax_group.cpp:119-178; per-tier refits cost as much as the
            # solves and feed back only second-order inlier changes)
            from opencalibration_tpu.pipeline.stages import refit_all_edges

            refit_all_edges(self.graph, self.model_store)
            self._edges_version += 1
            return "NEXT"
        return "REPEAT"

    def _run_final_global_relax(self) -> str:
        if self.skip_final_global_relax:
            return "NEXT"
        last = self._state_run_count >= FINAL_RELAX_MAX_ITERATIONS
        relaxed = self._global_relax(
            RelaxOptions(orientation=True, ground_mesh=True), None, last
        )
        self._emit([], [], relaxed, "final global relax", surfaces_updated=True)
        return "NEXT" if last else "REPEAT"

    def _run_generate_thumbnail(self) -> str:
        if self.generate_thumbnails and self.surfaces:
            from opencalibration_tpu.ortho.ortho import generate_orthomosaic

            self.thumbnail_mosaic = generate_orthomosaic(
                self.surfaces, self.graph, self.model_store
            )
            if self.thumbnail_mosaic is not None and self.thumbnail_path:
                import cv2

                cv2.imwrite(self.thumbnail_path, self.thumbnail_mosaic.rgba)
        self._emit([], [], [], "thumbnail")
        return "NEXT"

    def _run_densify_mesh(self) -> str:
        if self.skip_dense_mesh:
            return "NEXT"
        from opencalibration_tpu.dense.dense_stereo import densify_mesh

        densify_mesh(self.graph, self.model_store, self.surfaces)
        self._emit([], [], [], "densify", surfaces_updated=True)
        return "NEXT"

    def _run_dense_mesh_relax(self) -> str:
        if self.skip_dense_mesh:
            return "NEXT"
        from opencalibration_tpu.surface.refine import refine_surfaces

        self.surfaces = refine_surfaces(self.surfaces)
        self._emit([], [], [], "dense mesh relax", surfaces_updated=True)
        return "NEXT"

    def _wants_ortho(self) -> bool:
        return bool(self.ortho_path or self.textured_obj_prefix or self.dsm_path)

    def _run_generate_layers(self) -> str:
        if not self._wants_ortho() or not self.surfaces:
            return "NEXT"
        from opencalibration_tpu.ortho.ortho import OrthoJob, generate_dsm_geotiff

        if self.dsm_path:
            generate_dsm_geotiff(
                self.dsm_path, self.surfaces, self.graph, self.model_store,
                self.geocoord, max_megapixels=self.ortho_max_megapixels,
            )
        if self.ortho_path or self.textured_obj_prefix:
            self._ortho_job = OrthoJob(
                self.surfaces, self.graph, self.model_store, self.geocoord,
                max_megapixels=self.ortho_max_megapixels,
            )
            if self._ortho_job.ok:
                self._ortho_job.pass_layers()
        self._emit([], [], [], "generate layers")
        return "NEXT"

    def _run_color_balance(self) -> str:
        if self._ortho_job is not None and self._ortho_job.ok:
            self._ortho_job.solve_balance()
        self._emit([], [], [], "color balance")
        return "NEXT"

    def _run_blend_layers(self) -> str:
        if self._ortho_job is not None and self._ortho_job.ok:
            out_path = self.ortho_path or (
                (self.textured_obj_prefix or "ortho") + "_texture.tif"
            )

            def on_tile(info):
                self._emit([], [], [], "blend tile",
                           local=info.get("fraction_done", 0.0),
                           tile_update=info)

            self._ortho_job.tile_callback = on_tile
            self._ortho_job.pass_blend(out_path, camera_id_path=self.camera_id_path)
            if self.textured_obj_prefix:
                from opencalibration_tpu.io.geotiff import read_geotiff
                from opencalibration_tpu.ortho.ortho import generate_textured_obj

                img, origin, px, _ = read_geotiff(out_path)
                generate_textured_obj(
                    self.textured_obj_prefix, self.surfaces, img, origin, px[0]
                )
        self._emit([], [], [], "blend layers")
        return "NEXT"

    def _run_complete(self) -> str:
        # terminal: neither NEXT (no later state) nor REPEAT (callers
        # looping on iterate_once() returns would spin the run counter)
        return "DONE"
