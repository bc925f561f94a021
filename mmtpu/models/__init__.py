from mmtpu.models.avmnist import AVMNIST, MNISTAudio, MNISTImage, MonomodalEncoder
from mmtpu.models.conv import ConvBlock, ConvBlockArgs
from mmtpu.models.fc import FcClassifier, FcEncoder, MaxPoolFc, SimpleClassifier
from mmtpu.models.fusion import GatedBiModalNetwork, MaxOut, MultimodalPooling
from mmtpu.models.gcnet import GraphModel, GraphNetwork, MatchingAttention
from mmtpu.models.lenet import LeNet5, LeNet5Enhanced, LeNetEncoder
from mmtpu.models.lstm import LSTMClassifier, LSTMEncoder
from mmtpu.models.registry import build_module, resolve_encoder, resolve_model_name
from mmtpu.models.resnet import ResNet18, ResNet34, ResNet50, ResNetEncoder
from mmtpu.models.textcnn import TextCNN

__all__ = [
    "AVMNIST",
    "MNISTAudio",
    "MNISTImage",
    "MonomodalEncoder",
    "ConvBlock",
    "ConvBlockArgs",
    "FcClassifier",
    "FcEncoder",
    "MaxPoolFc",
    "SimpleClassifier",
    "GatedBiModalNetwork",
    "GraphModel",
    "GraphNetwork",
    "MatchingAttention",
    "MaxOut",
    "MultimodalPooling",
    "LeNet5",
    "LeNet5Enhanced",
    "LeNetEncoder",
    "LSTMClassifier",
    "LSTMEncoder",
    "build_module",
    "resolve_encoder",
    "resolve_model_name",
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "ResNetEncoder",
    "TextCNN",
]
