"""Scene I/O round-trips and demo-scene integrity."""

import io

from planeverb_tpu.scene import (DEMO_SCENES, AABB, Scene, demo_scene,
                                 loads_pv, save_pv)


def test_pv_roundtrip():
    scene = Scene(boxes=[AABB(1.5, 2.5, 3.0, 4.0, 0.9),
                         AABB(-1.0, 0.0, 1.0, 1.0, 0.5)])
    buf = io.StringIO()
    save_pv(scene, buf)
    parsed = loads_pv(buf.getvalue())
    assert len(parsed) == 2
    assert parsed.boxes[0] == scene.boxes[0]
    assert parsed.boxes[1] == scene.boxes[1]


def test_loads_reference_format():
    text = "2\n3 5 2.5 10 1 0.969536\n4 5 7.5 10 1 0.969536\n"
    scene = loads_pv(text)
    assert len(scene) == 2
    assert scene.boxes[0] == AABB(5.0, 2.5, 10.0, 1.0, 0.969536)


def test_demo_scene_inventory():
    for name in ("SmallRoom", "BigRoom", "HugeRoom", "Shoebox", "SingleWall",
                 "MiddleWallScene", "DirectionTester", "ExampleProject",
                 "FloorPlanScene"):
        assert name in DEMO_SCENES
    assert len(demo_scene("SmallRoom")) == 4
    assert len(demo_scene("FloorPlanScene")) == 18
