"""Independent torch mirror of U^2-Net (paper: arXiv 2005.09007) with the published
checkpoint's parameter naming (REBNCONV conv_s1/bn_s1, stages stage1..6 / stage5d..1d,
side1..6, outconv) — used by tests to golden convert.u2net_import + models.u2net against a
torch forward without needing the real u2netp.pth in this image."""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class REBNCONV(nn.Module):
    def __init__(self, cin, cout, dirate=1):
        super().__init__()
        self.conv_s1 = nn.Conv2d(cin, cout, 3, padding=dirate, dilation=dirate)
        self.bn_s1 = nn.BatchNorm2d(cout)
        self.relu_s1 = nn.ReLU(inplace=False)

    def forward(self, x):
        return self.relu_s1(self.bn_s1(self.conv_s1(x)))


def _up_to(x, ref):
    return F.interpolate(x, size=ref.shape[2:], mode="bilinear", align_corners=False)


class RSU(nn.Module):
    """RSU-height: a depth-`height` U-block of REBNCONVs with a dilated bottom."""

    def __init__(self, height, cin, mid, cout):
        super().__init__()
        self.height = height
        self.rebnconvin = REBNCONV(cin, cout)
        self.rebnconv1 = REBNCONV(cout, mid)
        for i in range(2, height + 1):
            setattr(self, f"rebnconv{i}", REBNCONV(mid, mid, dirate=2 if i == height else 1))
        for i in range(height - 1, 1, -1):
            setattr(self, f"rebnconv{i}d", REBNCONV(2 * mid, mid))
        self.rebnconv1d = REBNCONV(2 * mid, cout)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        enc = []
        h = hxin
        for i in range(1, self.height):
            h = getattr(self, f"rebnconv{i}")(h)
            enc.append(h)
            if i < self.height - 1:
                h = self.pool(h)
        h = getattr(self, f"rebnconv{self.height}")(enc[-1])
        for i in range(self.height - 1, 0, -1):
            h = getattr(self, f"rebnconv{i}d")(torch.cat([h, enc[i - 1]], dim=1))
            if i > 1:
                h = _up_to(h, enc[i - 2])
        return h + hxin


class RSU4F(nn.Module):
    """Dilated (pooling-free) RSU: dilations 1/2/4/8, decoder 4/2/1."""

    def __init__(self, cin, mid, cout):
        super().__init__()
        self.rebnconvin = REBNCONV(cin, cout)
        self.rebnconv1 = REBNCONV(cout, mid, dirate=1)
        self.rebnconv2 = REBNCONV(mid, mid, dirate=2)
        self.rebnconv3 = REBNCONV(mid, mid, dirate=4)
        self.rebnconv4 = REBNCONV(mid, mid, dirate=8)
        self.rebnconv3d = REBNCONV(2 * mid, mid, dirate=4)
        self.rebnconv2d = REBNCONV(2 * mid, mid, dirate=2)
        self.rebnconv1d = REBNCONV(2 * mid, cout, dirate=1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        hx1 = self.rebnconv1(hxin)
        hx2 = self.rebnconv2(hx1)
        hx3 = self.rebnconv3(hx2)
        hx4 = self.rebnconv4(hx3)
        hx3d = self.rebnconv3d(torch.cat([hx4, hx3], dim=1))
        hx2d = self.rebnconv2d(torch.cat([hx3d, hx2], dim=1))
        hx1d = self.rebnconv1d(torch.cat([hx2d, hx1], dim=1))
        return hx1d + hxin


def _make_stage(spec):
    h, cin, mid, cout = spec
    return RSU4F(cin, mid, cout) if h == 0 else RSU(h, cin, mid, cout)


class U2Net(nn.Module):
    """Parameterized over the same config tuples as models.u2net.U2NetConfig."""

    def __init__(self, encoder, decoder, side_channels):
        super().__init__()
        for i, spec in enumerate(encoder, start=1):
            setattr(self, f"stage{i}", _make_stage(spec))
        for i, spec in zip(range(5, 0, -1), decoder):
            setattr(self, f"stage{i}d", _make_stage(spec))
        for i, cin in enumerate(side_channels, start=1):
            setattr(self, f"side{i}", nn.Conv2d(cin, 1, 3, padding=1))
        self.outconv = nn.Conv2d(6, 1, 1)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        hx1 = self.stage1(x)
        hx2 = self.stage2(self.pool(hx1))
        hx3 = self.stage3(self.pool(hx2))
        hx4 = self.stage4(self.pool(hx3))
        hx5 = self.stage5(self.pool(hx4))
        hx6 = self.stage6(self.pool(hx5))
        hx5d = self.stage5d(torch.cat([_up_to(hx6, hx5), hx5], dim=1))
        hx4d = self.stage4d(torch.cat([_up_to(hx5d, hx4), hx4], dim=1))
        hx3d = self.stage3d(torch.cat([_up_to(hx4d, hx3), hx3], dim=1))
        hx2d = self.stage2d(torch.cat([_up_to(hx3d, hx2), hx2], dim=1))
        hx1d = self.stage1d(torch.cat([_up_to(hx2d, hx1), hx1], dim=1))
        d = [
            self.side1(hx1d), _up_to(self.side2(hx2d), x), _up_to(self.side3(hx3d), x),
            _up_to(self.side4(hx4d), x), _up_to(self.side5(hx5d), x), _up_to(self.side6(hx6), x),
        ]
        d0 = self.outconv(torch.cat(d, dim=1))
        return torch.sigmoid(d0)[:, 0]
