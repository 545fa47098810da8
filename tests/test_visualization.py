

class TestGLBExport:
    def test_write_and_parse(self, tmp_path):
        import numpy as np
        from vicasplat_tpu.visualization.glb import read_glb_json, write_glb

        pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
        cols = np.random.default_rng(1).uniform(size=(100, 3))
        poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        poses[:, 0, 3] = [0.0, 0.5, 1.0]
        path = tmp_path / "scene.glb"
        write_glb(path, pts, cols, camera_poses=poses, focal=1.2, cam_size=0.1)

        g = read_glb_json(path)
        assert g["asset"]["version"] == "2.0"
        # 1 point-cloud mesh + 3 camera meshes
        assert len(g["meshes"]) == 4
        assert g["meshes"][0]["primitives"][0]["mode"] == 0  # POINTS
        assert g["meshes"][1]["primitives"][0]["mode"] == 1  # LINES
        pos_acc = g["accessors"][g["meshes"][0]["primitives"][0]["attributes"]["POSITION"]]
        assert pos_acc["count"] == 100
        # binary chunk length matches the declared buffer
        import struct
        raw = open(path, "rb").read()
        jlen = struct.unpack_from("<I", raw, 12)[0]
        blen = struct.unpack_from("<I", raw, 20 + jlen)[0]
        assert g["buffers"][0]["byteLength"] == blen

    def test_points_only(self, tmp_path):
        import numpy as np
        from vicasplat_tpu.visualization.glb import read_glb_json, write_glb

        pts = np.zeros((10, 3), np.float32)
        cols = (np.ones((10, 3)) * 127).astype(np.uint8)
        path = tmp_path / "pts.glb"
        write_glb(path, pts, cols)
        g = read_glb_json(path)
        assert len(g["meshes"]) == 1


class TestViewerServer:
    def test_serves_page_and_scene(self, tmp_path):
        import urllib.request

        import numpy as np
        from vicasplat_tpu.visualization.glb import write_glb
        from vicasplat_tpu.visualization.viewer_server import serve_scene

        glb = tmp_path / "s.glb"
        write_glb(glb, np.zeros((5, 3), np.float32), np.ones((5, 3)) * 0.5)
        srv = serve_scene(glb, port=18733, block=False)
        try:
            html = urllib.request.urlopen(
                "http://127.0.0.1:18733/", timeout=5).read().decode()
            assert "loadGLB" in html and "webgl" in html
            data = urllib.request.urlopen(
                "http://127.0.0.1:18733/scene.glb", timeout=5).read()
            assert data[:4] == b"glTF"
            assert len(data) == glb.stat().st_size
        finally:
            srv.shutdown()
            srv.server_close()
