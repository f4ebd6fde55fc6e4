from .bpnet import BPNet, BPNetConfig
