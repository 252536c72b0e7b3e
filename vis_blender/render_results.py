"""Render a reconstructed point cloud + camera trajectory inside Blender.

Blender-side counterpart of nextbestpath_tpu.utils.plotting.export_blender_json
(the analog of the reference's vis_blender/blender_scripts.py:1-101, which
depends on the third-party ``blender_plots`` addon). This version needs ONLY
a stock Blender >= 3.6: the scatter is a vertices-only mesh turned into
render points by a generated Geometry Nodes tree (Mesh to Points + Set
Material), colored per point from a vertex color attribute; the trajectory
is a beveled Bezier curve with a blue-to-green linear gradient along its
length (same visual contract as the reference).

Run inside Blender (Scripting editor -> Open -> Run Script), or headless:

    blender --background --python vis_blender/render_results.py -- \
        --data-dir ./nextbestpath [--scene <name>] [--start 0] \
        [--z-threshold 2.5] [--point-size 0.4] [--out render.png]

Inputs (written by export_blender_json):
    <data-dir>/point_cloud.json   {"points": [[x,y,z],...], "colors": [...]}
    <data-dir>/trajectory.json    {scene: {start: {"X_cam_history": [...]}}}

``--z-threshold`` drops ceiling points (simulator Y-up maps to Blender Z-up
via the -90 deg X rotation applied below, so the threshold is on the
simulator's Y).
"""

import argparse
import json
import os
import sys

import bpy
from mathutils import Vector

# World placement shared by both objects: simulator frame is Y-up, Blender
# is Z-up -> rotate -90 deg about X; scale to a desk-sized render.
FRAME_ROT_X = 1.5708
FRAME_SCALE = 0.069


def _parse_args():
    argv = sys.argv
    argv = argv[argv.index("--") + 1:] if "--" in argv else []
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="./nextbestpath")
    ap.add_argument("--scene", default=None,
                    help="scene key in trajectory.json (default: first)")
    ap.add_argument("--start", default="0",
                    help="start-pose key inside the scene entry")
    ap.add_argument("--z-threshold", type=float, default=None,
                    help="drop points with simulator-Y above this (ceiling)")
    ap.add_argument("--point-size", type=float, default=0.4)
    ap.add_argument("--traj-stride", type=int, default=4,
                    help="keep every n-th trajectory sample for the curve")
    ap.add_argument("--out", default=None,
                    help="render to this PNG (headless use)")
    return ap.parse_args(argv)


def _place(obj):
    obj.rotation_euler[0] = FRAME_ROT_X
    obj.scale = (FRAME_SCALE, FRAME_SCALE, FRAME_SCALE)


def build_point_cloud(points, colors, point_size):
    """Vertices-only mesh + color attribute + GN Mesh-to-Points scatter."""
    mesh = bpy.data.meshes.new("nbp_points")
    mesh.from_pydata([tuple(p) for p in points], [], [])
    attr = mesh.color_attributes.new("pt_color", "FLOAT_COLOR", "POINT")
    flat = []
    for c in colors:
        flat.extend((c[0], c[1], c[2], 1.0))
    attr.data.foreach_set("color", flat)

    obj = bpy.data.objects.new("nbp_points", mesh)
    bpy.context.collection.objects.link(obj)

    mat = bpy.data.materials.new("nbp_point_material")
    mat.use_nodes = True
    tree = mat.node_tree
    tree.nodes.clear()
    out = tree.nodes.new("ShaderNodeOutputMaterial")
    bsdf = tree.nodes.new("ShaderNodeBsdfPrincipled")
    attr_node = tree.nodes.new("ShaderNodeAttribute")
    attr_node.attribute_name = "pt_color"
    tree.links.new(attr_node.outputs["Color"], bsdf.inputs["Base Color"])
    tree.links.new(bsdf.outputs["BSDF"], out.inputs["Surface"])

    # Geometry nodes: mesh vertices -> render points with the material.
    mod = obj.modifiers.new("nbp_scatter", "NODES")
    ng = bpy.data.node_groups.new("nbp_scatter_nodes", "GeometryNodeTree")
    ng.interface.new_socket("Geometry", in_out="INPUT",
                            socket_type="NodeSocketGeometry")
    ng.interface.new_socket("Geometry", in_out="OUTPUT",
                            socket_type="NodeSocketGeometry")
    n_in = ng.nodes.new("NodeGroupInput")
    n_out = ng.nodes.new("NodeGroupOutput")
    to_points = ng.nodes.new("GeometryNodeMeshToPoints")
    to_points.inputs["Radius"].default_value = point_size / 2.0
    set_mat = ng.nodes.new("GeometryNodeSetMaterial")
    set_mat.inputs["Material"].default_value = mat
    ng.links.new(n_in.outputs["Geometry"], to_points.inputs["Mesh"])
    ng.links.new(to_points.outputs["Points"], set_mat.inputs["Geometry"])
    ng.links.new(set_mat.outputs["Geometry"], n_out.inputs["Geometry"])
    mod.node_group = ng

    _place(obj)
    return obj


def build_trajectory(samples, stride):
    """Beveled Bezier through the camera history, blue->green gradient."""
    name = "nbp_trajectory"
    if name in bpy.data.objects:
        bpy.data.objects.remove(bpy.data.objects[name], do_unlink=True)
    pts = samples[::max(1, stride)]

    curve = bpy.data.curves.new("nbp_trajectory_curve", type="CURVE")
    curve.dimensions = "3D"
    curve.resolution_u = 12
    curve.bevel_depth = 0.2
    spline = curve.splines.new("BEZIER")
    spline.bezier_points.add(len(pts) - 1)
    for bp, p in zip(spline.bezier_points, pts):
        bp.co = Vector(p)
        bp.handle_left_type = "AUTO"
        bp.handle_right_type = "AUTO"

    obj = bpy.data.objects.new(name, curve)
    bpy.context.collection.objects.link(obj)

    mat = bpy.data.materials.new("nbp_trajectory_material")
    mat.use_nodes = True
    tree = mat.node_tree
    tree.nodes.clear()
    out = tree.nodes.new("ShaderNodeOutputMaterial")
    bsdf = tree.nodes.new("ShaderNodeBsdfPrincipled")
    coord = tree.nodes.new("ShaderNodeTexCoord")
    mapping = tree.nodes.new("ShaderNodeMapping")
    grad = tree.nodes.new("ShaderNodeTexGradient")
    grad.gradient_type = "LINEAR"
    ramp = tree.nodes.new("ShaderNodeValToRGB")
    ramp.color_ramp.interpolation = "LINEAR"
    ramp.color_ramp.elements[0].position = 0.0
    ramp.color_ramp.elements[0].color = (0.0, 0.0, 1.0, 1.0)  # start: blue
    ramp.color_ramp.elements[1].position = 1.0
    ramp.color_ramp.elements[1].color = (0.0, 1.0, 0.0, 1.0)  # end: green
    tree.links.new(coord.outputs["Generated"], mapping.inputs["Vector"])
    tree.links.new(mapping.outputs["Vector"], grad.inputs["Vector"])
    tree.links.new(grad.outputs["Color"], ramp.inputs["Fac"])
    tree.links.new(ramp.outputs["Color"], bsdf.inputs["Base Color"])
    tree.links.new(bsdf.outputs["BSDF"], out.inputs["Surface"])
    obj.data.materials.append(mat)

    _place(obj)
    return obj


def main():
    args = _parse_args()
    with open(os.path.join(args.data_dir, "point_cloud.json")) as f:
        pc = json.load(f)
    points, colors = pc["points"], pc["colors"]
    if args.z_threshold is not None:
        keep = [i for i, p in enumerate(points) if p[1] < args.z_threshold]
        points = [points[i] for i in keep]
        colors = [colors[i] for i in keep]

    with open(os.path.join(args.data_dir, "trajectory.json")) as f:
        traj = json.load(f)
    scene_key = args.scene or next(iter(traj))
    entry = traj[scene_key]
    start_key = args.start if args.start in entry else next(iter(entry))
    history = entry[start_key]["X_cam_history"]

    build_point_cloud(points, colors, args.point_size)
    build_trajectory(history, args.traj_stride)

    if args.out:
        bpy.context.scene.render.filepath = os.path.abspath(args.out)
        bpy.ops.render.render(write_still=True)


if __name__ == "__main__":
    main()
