"""Emit the public SqueezeNet-v1.1 and ResNet-50 deploy prototxts.

Real-weights validation (SURVEY.md §4, the reference's
[pub] tools/feather_convert_caffe.cpp + feather_test.cpp workflow) needs
the REAL deploy files so a genuine ``.caffemodel``'s layer names bind to
the converted graph.  This environment has no network, so the files are
reconstructed here: the layer NAMES, types, connectivity, and parameter
shapes follow the published upstream deploys exactly —
DeepScale/SqueezeNet ``SqueezeNet_v1.1/deploy.prototxt`` and
KaimingHe/deep-residual-networks ``ResNet-50-deploy.prototxt`` — which is
the binding contract for weight blobs; whitespace/field ordering is not.

Run ``python tools/deploys/gen_deploys.py`` to (re)write the two
``.prototxt`` files next to this script.
"""

import os

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def _layer(name, type_, bottoms, tops, body=""):
    lines = [f'layer {{\n  name: "{name}"\n  type: "{type_}"']
    for b in bottoms:
        lines.append(f'  bottom: "{b}"')
    for t in tops:
        lines.append(f'  top: "{t}"')
    if body:
        lines.append(body.rstrip())
    lines.append("}")
    return "\n".join(lines) + "\n"


def squeezenet_v11() -> str:
    out = ['input: "data"\ninput_shape {\n  dim: 1\n  dim: 3\n'
           '  dim: 227\n  dim: 227\n}\n']

    def conv(name, bot, top, ch, k, stride=1, pad=0):
        body = ("  convolution_param {\n"
                f"    num_output: {ch}\n"
                f"    kernel_size: {k}\n")
        if pad:
            body += f"    pad: {pad}\n"
        if stride != 1:
            body += f"    stride: {stride}\n"
        body += "  }"
        out.append(_layer(name, "Convolution", [bot], [top], body))

    def relu(name, top):
        out.append(_layer(name, "ReLU", [top], [top]))

    def pool_max(name, bot, top):
        out.append(_layer(name, "Pooling", [bot], [top],
                          "  pooling_param {\n    pool: MAX\n"
                          "    kernel_size: 3\n    stride: 2\n  }"))

    def fire(n, bot, sq, ex):
        p = f"fire{n}"
        conv(f"{p}/squeeze1x1", bot, f"{p}/squeeze1x1", sq, 1)
        relu(f"{p}/relu_squeeze1x1", f"{p}/squeeze1x1")
        conv(f"{p}/expand1x1", f"{p}/squeeze1x1", f"{p}/expand1x1", ex, 1)
        relu(f"{p}/relu_expand1x1", f"{p}/expand1x1")
        conv(f"{p}/expand3x3", f"{p}/squeeze1x1", f"{p}/expand3x3", ex, 3,
             pad=1)
        relu(f"{p}/relu_expand3x3", f"{p}/expand3x3")
        out.append(_layer(f"{p}/concat", "Concat",
                          [f"{p}/expand1x1", f"{p}/expand3x3"],
                          [f"{p}/concat"]))
        return f"{p}/concat"

    conv("conv1", "data", "conv1", 64, 3, stride=2)
    relu("relu_conv1", "conv1")
    pool_max("pool1", "conv1", "pool1")
    x = fire(2, "pool1", 16, 64)
    x = fire(3, x, 16, 64)
    pool_max("pool3", x, "pool3")
    x = fire(4, "pool3", 32, 128)
    x = fire(5, x, 32, 128)
    pool_max("pool5", x, "pool5")
    x = fire(6, "pool5", 48, 192)
    x = fire(7, x, 48, 192)
    x = fire(8, x, 64, 256)
    x = fire(9, x, 64, 256)
    out.append(_layer("drop9", "Dropout", [x], [x],
                      "  dropout_param {\n    dropout_ratio: 0.5\n  }"))
    conv("conv10", x, "conv10", 1000, 1)
    relu("relu_conv10", "conv10")
    out.append(_layer("pool10", "Pooling", ["conv10"], ["pool10"],
                      "  pooling_param {\n    pool: AVE\n"
                      "    global_pooling: true\n  }"))
    out.append(_layer("prob", "Softmax", ["pool10"], ["prob"]))
    return "".join(out)


def resnet50() -> str:
    out = ['input: "data"\ninput_shape {\n  dim: 1\n  dim: 3\n'
           '  dim: 224\n  dim: 224\n}\n']

    def conv(name, bot, top, ch, k, stride=1, pad=0):
        body = ("  convolution_param {\n"
                f"    num_output: {ch}\n"
                f"    kernel_size: {k}\n")
        if pad:
            body += f"    pad: {pad}\n"
        if stride != 1:
            body += f"    stride: {stride}\n"
        body += "    bias_term: false\n  }"
        out.append(_layer(name, "Convolution", [bot], [top], body))

    def bn_scale(stem, top):
        out.append(_layer(f"bn{stem}", "BatchNorm", [top], [top],
                          "  batch_norm_param {\n"
                          "    use_global_stats: true\n  }"))
        out.append(_layer(f"scale{stem}", "Scale", [top], [top],
                          "  scale_param {\n    bias_term: true\n  }"))

    def relu(name, top):
        out.append(_layer(name, "ReLU", [top], [top]))

    def block(stage, blk, bot, ch, stride):
        n = f"{stage}{blk}"
        if blk == "a":
            conv(f"res{n}_branch1", bot, f"res{n}_branch1", ch * 4, 1,
                 stride=stride)
            bn_scale(f"{n}_branch1", f"res{n}_branch1")
            shortcut = f"res{n}_branch1"
        else:
            shortcut = bot
        conv(f"res{n}_branch2a", bot, f"res{n}_branch2a", ch, 1,
             stride=stride if blk == "a" else 1)
        bn_scale(f"{n}_branch2a", f"res{n}_branch2a")
        relu(f"res{n}_branch2a_relu", f"res{n}_branch2a")
        conv(f"res{n}_branch2b", f"res{n}_branch2a", f"res{n}_branch2b",
             ch, 3, pad=1)
        bn_scale(f"{n}_branch2b", f"res{n}_branch2b")
        relu(f"res{n}_branch2b_relu", f"res{n}_branch2b")
        conv(f"res{n}_branch2c", f"res{n}_branch2b", f"res{n}_branch2c",
             ch * 4, 1)
        bn_scale(f"{n}_branch2c", f"res{n}_branch2c")
        out.append(_layer(f"res{n}", "Eltwise",
                          [shortcut, f"res{n}_branch2c"], [f"res{n}"]))
        relu(f"res{n}_relu", f"res{n}")
        return f"res{n}"

    conv("conv1", "data", "conv1", 64, 7, stride=2, pad=3)
    # the public deploy names these bn_conv1/scale_conv1 (not bnconv1)
    out.append(_layer("bn_conv1", "BatchNorm", ["conv1"], ["conv1"],
                      "  batch_norm_param {\n"
                      "    use_global_stats: true\n  }"))
    out.append(_layer("scale_conv1", "Scale", ["conv1"], ["conv1"],
                      "  scale_param {\n    bias_term: true\n  }"))
    relu("conv1_relu", "conv1")
    out.append(_layer("pool1", "Pooling", ["conv1"], ["pool1"],
                      "  pooling_param {\n    pool: MAX\n"
                      "    kernel_size: 3\n    stride: 2\n  }"))
    x = "pool1"
    for stage, ch, blocks, stride in ((2, 64, 3, 1), (3, 128, 4, 2),
                                      (4, 256, 6, 2), (5, 512, 3, 2)):
        for i in range(blocks):
            x = block(stage, chr(ord("a") + i), x, ch,
                      stride if i == 0 else 1)
    out.append(_layer("pool5", "Pooling", [x], ["pool5"],
                      "  pooling_param {\n    pool: AVE\n"
                      "    kernel_size: 7\n    stride: 1\n  }"))
    out.append(_layer("fc1000", "InnerProduct", ["pool5"], ["fc1000"],
                      "  inner_product_param {\n"
                      "    num_output: 1000\n  }"))
    out.append(_layer("prob", "Softmax", ["fc1000"], ["prob"]))
    return "".join(out)


def write_all():
    for fn, gen in (("squeezenet_v11_deploy.prototxt", squeezenet_v11),
                    ("resnet50_deploy.prototxt", resnet50)):
        path = os.path.join(OUT_DIR, fn)
        with open(path, "w") as f:
            f.write(gen())
        print(f"wrote {path}")


if __name__ == "__main__":
    write_all()
