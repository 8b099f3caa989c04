"""PyTorch-CPU SeqGAN baseline — the reference algorithm, runnable today.

The shipped reference uses a torch-0.3-era API (Variable, .data[0],
async=True) that no longer runs; this is a *faithful* modern-torch port of
its adversarial-epoch algorithm and cost structure, used ONLY as the
baseline side of the >=20x BASELINE.json comparison:

- Generator.generate: per-token Python loop (SeqGan_Pytorch/generator.py:62-88)
- Rollout.get_reward: rollout_num x (seq_len-1) sequential full generations
  + D forwards (rollout.py:29-48)
- adversarial epoch: 1 PG G-step + d_steps x k D retraining epochs with
  negatives regenerated per step (seqgan.py:125-168)

Same hyperparameters as the reference entry script
(SeqGan_Pytorch/train.py:22-58): vocab 5000, seq 20, batch 64, emb 32,
hidden 32, 12 filter sizes totalling 1720 filters.
"""

from __future__ import annotations

import time

import torch
import torch.nn as nn
import torch.nn.functional as F

VOCAB, SEQ, EMB, HID = 5000, 20, 32, 32
FILTER_SIZES = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 15, 20]
NUM_FILTERS = [100, 200, 200, 200, 200, 100, 100, 100, 100, 100, 160, 160]


class G(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn.Embedding(VOCAB, EMB)
        self.lstm = nn.LSTM(EMB, HID, batch_first=True)
        self.out = nn.Linear(HID, VOCAB)

    def forward(self, x, state=None):
        h, state = self.lstm(self.emb(x), state)
        return self.out(h), state

    @torch.no_grad()
    def generate(self, prefix, total_len=SEQ):
        """Per-token Python sampling loop (generator.py:62-88)."""
        B = prefix.shape[0]
        out, state = self.forward(prefix)
        toks = [prefix]
        tok = torch.multinomial(F.softmax(out[:, -1], -1), 1)
        for _ in range(total_len - prefix.shape[1]):
            toks.append(tok)
            out, state = self.forward(tok, state)
            tok = torch.multinomial(F.softmax(out[:, -1], -1), 1)
        return torch.cat(toks, 1)[:, :total_len]


class D(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn.Embedding(VOCAB, 64)
        self.convs = nn.ModuleList(
            [nn.Conv2d(1, nf, (fs, 64)) for fs, nf in zip(FILTER_SIZES, NUM_FILTERS)]
        )
        total = sum(NUM_FILTERS)
        self.hw_h = nn.Linear(total, total)
        self.hw_t = nn.Linear(total, total)
        self.fc = nn.Linear(total, 2)

    def forward(self, x):
        e = self.emb(x).unsqueeze(1)  # [B,1,T,64]
        feats = []
        for conv in self.convs:
            h = F.relu(conv(e)).squeeze(3)
            feats.append(F.max_pool1d(h, h.shape[2]).squeeze(2))
        f = torch.cat(feats, 1)
        t = torch.sigmoid(self.hw_t(f))
        f = t * F.relu(self.hw_h(f)) + (1 - t) * f
        return self.fc(f)

    @torch.no_grad()
    def pos_prob(self, x):
        return F.softmax(self.forward(x), -1)[:, 1]


def rollout_rewards(g: G, d: D, samples, rollout_num=16):
    """rollout.py:20-51: sequential rollouts per (i, prefix)."""
    B, T = samples.shape
    rewards = []
    for i in range(rollout_num):
        for t in range(1, T):
            completed = g.generate(samples[:, :t])
            p = d.pos_prob(completed)
            if i == 0:
                rewards.append(p.clone())
            else:
                rewards[t - 1] += p
        p = d.pos_prob(samples)
        if i == 0:
            rewards.append(p.clone())
        else:
            rewards[T - 1] += p
    return torch.stack(rewards, 1) / rollout_num


def adversarial_epoch(g, d, g_opt, d_opt, positive, batch=64,
                      rollout_num=16, d_steps=5, d_epochs=3):
    """seqgan.py:125-168 cost structure: one PG G-step + D retraining."""
    # --- G step with MC rewards
    start = torch.zeros(batch, 1, dtype=torch.long)
    samples = g.generate(start)
    rewards = rollout_rewards(g, d, samples, rollout_num)
    inp = torch.cat([start, samples[:, :-1]], 1)
    logits, _ = g.forward(inp)
    logp = F.log_softmax(logits, -1)
    chosen = logp.gather(2, samples.unsqueeze(2)).squeeze(2)
    loss = -(chosen * rewards).mean()
    g_opt.zero_grad(); loss.backward()
    nn.utils.clip_grad_norm_(g.parameters(), 5.0)
    g_opt.step()

    # --- D retraining: regenerate negatives each step (seqgan.py:83-93)
    n = positive.shape[0]
    ce = nn.CrossEntropyLoss()
    for _ in range(d_steps):
        with torch.no_grad():
            neg = torch.cat(
                [g.generate(torch.zeros(batch, 1, dtype=torch.long))
                 for _ in range(-(-n // batch))]
            )[:n]
        data = torch.cat([positive, neg])
        labels = torch.cat([torch.ones(n, dtype=torch.long), torch.zeros(n, dtype=torch.long)])
        for _ in range(d_epochs):
            perm = torch.randperm(len(data))
            for i in range(0, len(data) - batch + 1, batch):
                idx = perm[i : i + batch]
                out = d(data[idx])
                dl = ce(out, labels[idx])
                d_opt.zero_grad(); dl.backward()
                nn.utils.clip_grad_norm_(d.parameters(), 5.0)
                d_opt.step()
    return float(loss)


def run(generated_num=1024, rollout_num=16, d_steps=5, d_epochs=3) -> float:
    """Returns wall-clock seconds for one adversarial epoch."""
    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())  # default all cores
    g, d = G(), D()
    g_opt = torch.optim.Adam(g.parameters(), 1e-2)
    d_opt = torch.optim.Adam(d.parameters(), 1e-2)
    with torch.no_grad():
        positive = torch.cat(
            [g.generate(torch.zeros(64, 1, dtype=torch.long))
             for _ in range(-(-generated_num // 64))]
        )[:generated_num]
    t0 = time.perf_counter()
    adversarial_epoch(g, d, g_opt, d_opt, positive, 64, rollout_num, d_steps, d_epochs)
    return time.perf_counter() - t0


if __name__ == "__main__":
    dt = run()
    print(f"torch CPU adversarial epoch: {dt:.2f}s")
