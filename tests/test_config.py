import os
import textwrap

import pytest

from pixelnerf_yolo_tpu.config.hocon import Config, parse_file, parse_string

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_scalars_and_nesting():
    conf = parse_string(
        textwrap.dedent(
            """
            # comment
            model {
                use_encoder = True   # trailing comment
                lr = 1e-4
                n = 5
                name = resnet34
                quoted = "hello world"
                nothing = null
            }
            top = 3.5
            """
        )
    )
    assert conf.get_bool("model.use_encoder") is True
    assert conf.get_float("model.lr") == pytest.approx(1e-4)
    assert conf.get_int("model.n") == 5
    assert conf.get_string("model.name") == "resnet34"
    assert conf["model.quoted"] == "hello world"
    assert conf.get("model.nothing") is None
    assert conf.get_float("top") == 3.5


def test_inline_object_comma_members():
    """HOCON inline objects with comma-separated members — pyhocon
    accepts "yolo { a = 1, b = 2 }"; commas inside list literals and
    quoted strings must survive."""
    conf = parse_string(
        'yolo { nms_threshold = 0.60, cross_scale_nms_iou = 0.20 }\n'
        'lst = [1, 2, 3]\n'
        'm { a = 1, b { c = 2 }, d = "x,y" }'
    )
    assert conf.get_float("yolo.nms_threshold") == 0.6
    assert conf.get_float("yolo.cross_scale_nms_iou") == 0.2
    assert conf.get_list("lst") == [1, 2, 3]
    assert conf.get_int("m.a") == 1
    assert conf.get_int("m.b.c") == 2
    assert conf.get_string("m.d") == "x,y"


def test_multiline_list_commas_survive():
    """A list literal wrapped over several physical lines keeps its
    commas — the inline-object comma split must track bracket depth
    ACROSS lines, not per line."""
    conf = parse_string("lst = [1, 2,\n  3, 4]\nafter = 5")
    assert conf.get_list("lst") == [1, 2, 3, 4]
    assert conf.get_int("after") == 5
    nested = parse_string(
        "anchors = [\n  [[0.1, 0.2], [0.3, 0.4]],\n  [[0.5, 0.6], [0.7, 0.8]]\n]"
    )
    assert nested.get_list("anchors")[1][0] == [0.5, 0.6]


def test_defaults_and_missing():
    conf = parse_string("a { b = 1 }")
    assert conf.get_int("a.b", 7) == 1
    assert conf.get_int("a.zzz", 7) == 7
    assert conf.get_bool("nope", False) is False
    assert "a.b" in conf and "a.c" not in conf
    with pytest.raises(KeyError):
        conf["a.c"]


def test_multiline_nested_lists():
    conf = parse_string(
        textwrap.dedent(
            """
            yolo {
                image_scale = [0.5, 0.47407]
                anchors = [
                    [[0.02, 0.03], [0.04, 0.07]],
                    [[0.07, 0.15], [0.15, 0.11]]
                ]
                metric_views = [[0,2,5],[0,2,6]]
                empty = []
            }
            """
        )
    )
    assert conf.get_list("yolo.image_scale") == [0.5, 0.47407]
    anchors = conf["yolo.anchors"]
    assert anchors[0][1] == [0.04, 0.07]
    assert conf["yolo.metric_views"] == [[0, 2, 5], [0, 2, 6]]
    assert conf["yolo.empty"] == []


def test_include_and_merge(tmp_path):
    base = tmp_path / "base.conf"
    base.write_text("model { a = 1\n b = 2\n sub { x = 1 } }\nrenderer { type = nerf }\n")
    child = tmp_path / "child.conf"
    child.write_text(
        'include required("base.conf")\nmodel { b = 3\n sub { y = 2 } }\n'
    )
    conf = parse_file(str(child))
    assert conf.get_int("model.a") == 1
    assert conf.get_int("model.b") == 3  # override
    assert conf.get_int("model.sub.x") == 1  # deep merge keeps
    assert conf.get_int("model.sub.y") == 2
    assert conf.get_string("renderer.type") == "nerf"


def test_repo_conf_tree_parses():
    conf = parse_file(os.path.join(REPO, "conf/exp/yolo.conf"))
    # layered values from default.conf <- default_mv.conf <- yolo.conf
    assert conf.get_bool("model.use_encoder") is True
    assert conf.get_int("model.mlp_coarse.n_blocks") == 5
    assert conf.get_int("model.mlp_coarse.combine_layer") == 3
    assert conf.get_bool("model.mlp_coarse.yolo") is True
    assert conf.get_string("model.encoder.backbone") == "custom"
    # encoder.index_padding survives the partial override of the encoder block
    assert conf.get_string("model.encoder.index_padding") == "zeros"
    assert conf.get_string("renderer.type") == "yolo"
    assert conf.get_int("renderer.n_coarse") == 128
    assert conf.get_int("renderer.eval_batch_size") == 128
    assert conf["yolo.anchors"][0] == [[0.02, 0.03], [0.04, 0.07], [0.08, 0.06]]
    assert conf.get_float("yolo.weights.object_loss") == 20
    assert conf.get_list("yolo.metric_views") == [[0, 2, 5], [0, 2, 6], [2, 6, 9]]
    assert conf.get_float("yolo.match_iou_threshold") == 0.2

    nerf_conf = parse_file(os.path.join(REPO, "conf/exp/srn.conf"))
    assert nerf_conf.get_string("renderer.type") == "nerf"
    assert nerf_conf.get_int("renderer.n_coarse") == 64
    assert nerf_conf.get_int("renderer.n_fine") == 32
    assert nerf_conf.get_int("renderer.n_fine_depth") == 16
    assert nerf_conf.get_bool("renderer.white_bkgd") is True
    assert nerf_conf.get_list("renderer.sched") == []
    assert nerf_conf.get_string("data.format") == "srn"

    dtu = parse_file(os.path.join(REPO, "conf/exp/dtu.conf"))
    assert dtu.get_bool("renderer.white_bkgd") is False
    assert dtu.get_int("train.num_epoch_repeats") == 32


def test_put_and_to_dict():
    conf = Config({})
    conf.put("a.b.c", 5)
    assert conf["a.b.c"] == 5
    d = conf.to_dict()
    assert d == {"a": {"b": {"c": 5}}}
