"""Test-only PyTorch build of the reference architecture.

Golden-value harness implementing the SURVEY.md §2.2 spec (reference
``PointNetSegmentation``, pcs.py:65-133) with the reference's exact
state_dict key names, so our export/import and forward numerics can be
checked against real torch kernels. This is test fixture code, not part of
the framework.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class RefPointNetSeg(nn.Module):
    def __init__(self, num_classes: int, input_dim: int = 4):
        super().__init__()
        self.conv1 = nn.Conv1d(input_dim, 64, 1)
        self.conv2 = nn.Conv1d(64, 64, 1)
        self.conv3 = nn.Conv1d(64, 64, 1)
        self.conv4 = nn.Conv1d(64, 128, 1)
        self.conv5 = nn.Conv1d(128, 1024, 1)
        self.global_feat = nn.Conv1d(1024, 1024, 1)
        self.seg_conv1 = nn.Conv1d(1088, 512, 1)
        self.seg_conv2 = nn.Conv1d(512, 256, 1)
        self.seg_conv3 = nn.Conv1d(256, 128, 1)
        self.seg_conv4 = nn.Conv1d(128, num_classes, 1)
        self.bn1 = nn.BatchNorm1d(64)
        self.bn2 = nn.BatchNorm1d(64)
        self.bn3 = nn.BatchNorm1d(64)
        self.bn4 = nn.BatchNorm1d(128)
        self.bn5 = nn.BatchNorm1d(1024)
        self.bn_global = nn.BatchNorm1d(1024)
        self.bn_seg1 = nn.BatchNorm1d(512)
        self.bn_seg2 = nn.BatchNorm1d(256)
        self.bn_seg3 = nn.BatchNorm1d(128)
        self.dropout = nn.Dropout(0.3)

    def forward(self, x):
        # x: (B, M, D) -> logits (B, M, C); dataflow per pcs.py:98-133
        m = x.shape[1]
        x = x.transpose(1, 2)
        x = F.relu(self.bn1(self.conv1(x)))
        point_feat = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(point_feat)))
        x = F.relu(self.bn4(self.conv4(x)))
        x = F.relu(self.bn5(self.conv5(x)))
        g = F.relu(self.bn_global(self.global_feat(x)))
        g = torch.max(g, 2, keepdim=True)[0].repeat(1, 1, m)
        x = torch.cat([point_feat, g], dim=1)
        x = F.relu(self.bn_seg1(self.seg_conv1(x)))
        x = self.dropout(x)
        x = F.relu(self.bn_seg2(self.seg_conv2(x)))
        x = self.dropout(x)
        x = F.relu(self.bn_seg3(self.seg_conv3(x)))
        x = self.seg_conv4(x)
        return x.transpose(1, 2)
