"""PyTorch rendition of the reference architecture for golden parity tests.

These modules restate the surveyed reference architecture
(``upstream:pointnet/model.py`` / ``upstream:model/discriminator.py``,
SURVEY.md §2.3-2.4) in stock torch, including the lineage's quirks:
dropout sits *between* fc2 and bn2 in the classifier; conv3 has BN but no
ReLU before the max-pool; T-Net output adds a flattened identity. The
parity tests copy weights from the JAX models into these and assert the
logits agree — locking our numerics to the reference formulas
(``BASELINE.json:5``). CPU torch only; never imported by the framework.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class STNkdTorch(nn.Module):
    def __init__(self, k: int):
        super().__init__()
        self.k = k
        self.conv1 = nn.Conv1d(k, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.fc1 = nn.Linear(1024, 512)
        self.fc2 = nn.Linear(512, 256)
        self.fc3 = nn.Linear(256, k * k)
        self.bn1 = nn.BatchNorm1d(64)
        self.bn2 = nn.BatchNorm1d(128)
        self.bn3 = nn.BatchNorm1d(1024)
        self.bn4 = nn.BatchNorm1d(512)
        self.bn5 = nn.BatchNorm1d(256)

    def forward(self, x):  # x: [B, k, N]
        b = x.size(0)
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = torch.max(x, 2)[0]
        x = F.relu(self.bn4(self.fc1(x)))
        x = F.relu(self.bn5(self.fc2(x)))
        x = self.fc3(x)
        iden = torch.eye(self.k).flatten().repeat(b, 1)
        return (x + iden).view(b, self.k, self.k)


class PointNetFeatTorch(nn.Module):
    def __init__(self, global_feat=True, feature_transform=False):
        super().__init__()
        self.stn = STNkdTorch(3)
        self.conv1 = nn.Conv1d(3, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.bn1 = nn.BatchNorm1d(64)
        self.bn2 = nn.BatchNorm1d(128)
        self.bn3 = nn.BatchNorm1d(1024)
        self.global_feat = global_feat
        self.feature_transform = feature_transform
        if feature_transform:
            self.fstn = STNkdTorch(64)

    def forward(self, x):  # x: [B, 3, N]
        n = x.size(2)
        trans = self.stn(x)
        x = torch.bmm(x.transpose(2, 1), trans).transpose(2, 1)
        x = F.relu(self.bn1(self.conv1(x)))
        trans_feat = None
        if self.feature_transform:
            trans_feat = self.fstn(x)
            x = torch.bmm(x.transpose(2, 1), trans_feat).transpose(2, 1)
        point_feat = x
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.bn3(self.conv3(x))  # NB: no ReLU before the max-pool
        x = torch.max(x, 2)[0]
        if self.global_feat:
            return x, trans, trans_feat
        g = x.view(-1, 1024, 1).repeat(1, 1, n)
        return torch.cat([point_feat, g], 1), trans, trans_feat


class PointNetClsTorch(nn.Module):
    def __init__(self, k=40, feature_transform=False):
        super().__init__()
        self.feat = PointNetFeatTorch(True, feature_transform)
        self.fc1 = nn.Linear(1024, 512)
        self.fc2 = nn.Linear(512, 256)
        self.fc3 = nn.Linear(256, k)
        self.bn1 = nn.BatchNorm1d(512)
        self.bn2 = nn.BatchNorm1d(256)
        self.dropout = nn.Dropout(0.3)

    def forward(self, x):
        x, trans, trans_feat = self.feat(x)
        x = F.relu(self.bn1(self.fc1(x)))
        # Lineage quirk: dropout applied between fc2 and bn2.
        x = F.relu(self.bn2(self.dropout(self.fc2(x))))
        x = self.fc3(x)
        return F.log_softmax(x, dim=1), trans, trans_feat


class PointNetDenseClsTorch(nn.Module):
    def __init__(self, k=50, feature_transform=False):
        super().__init__()
        self.k = k
        self.feat = PointNetFeatTorch(False, feature_transform)
        self.conv1 = nn.Conv1d(1088, 512, 1)
        self.conv2 = nn.Conv1d(512, 256, 1)
        self.conv3 = nn.Conv1d(256, 128, 1)
        self.conv4 = nn.Conv1d(128, k, 1)
        self.bn1 = nn.BatchNorm1d(512)
        self.bn2 = nn.BatchNorm1d(256)
        self.bn3 = nn.BatchNorm1d(128)

    def forward(self, x):
        b, _, n = x.size()
        x, trans, trans_feat = self.feat(x)
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.conv4(x)
        x = x.transpose(2, 1).contiguous()
        return F.log_softmax(x, dim=-1), trans, trans_feat


class FCDiscriminatorTorch(nn.Module):
    def __init__(self, num_classes=50, ndf=64):
        super().__init__()
        self.conv1 = nn.Conv1d(num_classes, ndf, 1)
        self.conv2 = nn.Conv1d(ndf, ndf * 2, 1)
        self.conv3 = nn.Conv1d(ndf * 2, ndf * 4, 1)
        self.conv4 = nn.Conv1d(ndf * 4, ndf * 8, 1)
        self.classifier = nn.Conv1d(ndf * 8, 1, 1)
        self.leaky = nn.LeakyReLU(0.2)

    def forward(self, x):  # x: [B, k, N]
        x = self.leaky(self.conv1(x))
        x = self.leaky(self.conv2(x))
        x = self.leaky(self.conv3(x))
        x = self.leaky(self.conv4(x))
        return self.classifier(x)


# ---------------------------------------------------------------------------
# Weight translation JAX -> torch
# ---------------------------------------------------------------------------

def _copy_dense_to_conv1d(p, conv: nn.Conv1d):
    import numpy as np
    w = np.asarray(p["w"])  # [Cin, Cout]
    conv.weight.data = torch.from_numpy(w.T.copy()).unsqueeze(-1)
    conv.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())


def _copy_dense_to_linear(p, lin: nn.Linear):
    import numpy as np
    lin.weight.data = torch.from_numpy(np.asarray(p["w"]).T.copy())
    lin.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())


def _copy_bn(p, s, bn: nn.BatchNorm1d):
    import numpy as np
    bn.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    bn.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())
    bn.running_mean.data = torch.from_numpy(np.asarray(s["mean"]).copy())
    bn.running_var.data = torch.from_numpy(np.asarray(s["var"]).copy())


def load_tnet(params, state, m: STNkdTorch):
    for i in (1, 2, 3):
        _copy_dense_to_conv1d(params[f"conv{i}"], getattr(m, f"conv{i}"))
        _copy_bn(params[f"bn{i}"], state[f"bn{i}"], getattr(m, f"bn{i}"))
    _copy_dense_to_linear(params["fc1"], m.fc1)
    _copy_dense_to_linear(params["fc2"], m.fc2)
    _copy_dense_to_linear(params["fc3"], m.fc3)
    _copy_bn(params["bn_fc1"], state["bn_fc1"], m.bn4)
    _copy_bn(params["bn_fc2"], state["bn_fc2"], m.bn5)


def load_encoder(params, state, m: PointNetFeatTorch):
    load_tnet(params["stn"], state["stn"], m.stn)
    for i in (1, 2, 3):
        _copy_dense_to_conv1d(params[f"conv{i}"], getattr(m, f"conv{i}"))
        _copy_bn(params[f"bn{i}"], state[f"bn{i}"], getattr(m, f"bn{i}"))
    if m.feature_transform:
        load_tnet(params["fstn"], state["fstn"], m.fstn)


def load_classifier(params, state, m: PointNetClsTorch):
    load_encoder(params["feat"], state["feat"], m.feat)
    _copy_dense_to_linear(params["fc1"], m.fc1)
    _copy_dense_to_linear(params["fc2"], m.fc2)
    _copy_dense_to_linear(params["fc3"], m.fc3)
    _copy_bn(params["bn1"], state["bn1"], m.bn1)
    _copy_bn(params["bn2"], state["bn2"], m.bn2)


def load_segmenter(params, state, m: PointNetDenseClsTorch):
    load_encoder(params["feat"], state["feat"], m.feat)
    for i in (1, 2, 3):
        _copy_dense_to_conv1d(params[f"conv{i}"], getattr(m, f"conv{i}"))
        _copy_bn(params[f"bn{i}"], state[f"bn{i}"], getattr(m, f"bn{i}"))
    _copy_dense_to_conv1d(params["conv4"], m.conv4)


def load_discriminator(params, m: FCDiscriminatorTorch):
    _copy_dense_to_conv1d(params["conv1"], m.conv1)
    _copy_dense_to_conv1d(params["conv2"], m.conv2)
    _copy_dense_to_conv1d(params["conv3"], m.conv3)
    _copy_dense_to_conv1d(params["conv4"], m.conv4)
    _copy_dense_to_conv1d(params["conv5"], m.classifier)
