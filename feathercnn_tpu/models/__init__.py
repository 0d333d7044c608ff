from .builder import GraphBuilder
from .zoo import (MODEL_BUILDERS, alexnet, build_model, deeplab_largefov,
                  densenet169, densenet201, squeezenet_v10, vgg19,
                  faster_rcnn_vgg16, rfcn_resnet101,
                  densenet121, fcn8s, fcn16s, fcn32s, googlenet, inception_v3,
                  mobilenet_v1, mobilenet_v2, pspnet50, resnet50, resnet101,
                  resnet152, resnext50, se_resnet50, shufflenet_v1, shufflenet_v2, squeezenet_v11, vgg16)

__all__ = ["GraphBuilder", "MODEL_BUILDERS", "alexnet", "build_model",
           "deeplab_largefov", "densenet121", "densenet169", "densenet201",
           "squeezenet_v10", "vgg19", "faster_rcnn_vgg16", "rfcn_resnet101", "fcn8s", "fcn16s", "fcn32s",
           "googlenet", "inception_v3", "mobilenet_v1", "mobilenet_v2", "pspnet50",
           "resnet50", "resnet101", "resnet152", "resnext50", "se_resnet50",
           "shufflenet_v1", "shufflenet_v2", "squeezenet_v11", "vgg16"]
