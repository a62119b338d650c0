#!/usr/bin/env python3
"""Generate the synthetic LoCoMo-shaped dataset for graft.LocomoRunner
(deterministic, seed 7).

Shape mirrors what the reference's loader flattens locomo10.json into
(reference: benchmarks/locomo/dataset.py:1-291): per conversation, a
turn list with `D{session}:{turn}` ids and a QA list over the five
LoCoMo categories (single_hop / multi_hop / temporal / open_domain /
adversarial). Evidence = the turn ids that support the answer;
adversarial QAs have no evidence and draw their content words from a
held-out vocabulary slice that never appears in any turn, so a
thresholded retriever CAN refuse them.

Hardness: session-level topic words are shared by all turns of the
session, so a question leaning on topic words sees ~16 near-ties and
must rely on the evidence turns' unique words to rank inside top-k —
keeping R@5 well off the ceiling like the reference's real run
(R@5 0.42, results_sweep.json).

Usage: gen_locomo.py <out.json>   then
  SPARK_GRAFT_CPUS=32 sbt "runMain graft.LocomoRunner <out.json>"
"""
import json
import random
import sys

random.seed(7)
# Turn vocabulary: w0..w1499. Adversarial vocabulary: a0..a199 (disjoint).
VOCAB = [f"w{i}" for i in range(1500)]
ADV_VOCAB = [f"a{i}" for i in range(200)]
CATS = ["single_hop", "multi_hop", "temporal", "open_domain", "adversarial"]
SPEAKERS = ["alice", "bob"]

conversations = []
for c in range(10):
    conv_id = f"conv_{c}"
    turns = []
    by_session = {}
    for s in range(1, 13):  # 12 sessions, 1-based like LoCoMo
        topic = [random.choice(VOCAB) for _ in range(8)]
        for t in range(16):
            uniq = [random.choice(VOCAB) for _ in range(6)]
            turns.append({
                "turn_id": f"D{s}:{t}",
                "session": s,
                "turn_index": t,
                "speaker": SPEAKERS[t % 2],
                "text": " ".join(topic + uniq),
            })
            by_session.setdefault(s, []).append((f"D{s}:{t}", topic, uniq))
    qa = []
    for i in range(30):
        cat = CATS[i % 5]
        qa_id = f"{conv_id}_qa_{i}"
        if cat == "adversarial":
            qtoks = [random.choice(ADV_VOCAB) for _ in range(8)]
            qa.append({"qa_id": qa_id, "question": " ".join(qtoks),
                       "answer": "", "category": cat, "evidence": [],
                       "adversarial_answer": "not mentioned"})
            continue
        n_ev = {"single_hop": 1, "temporal": 1, "multi_hop": 2, "open_domain": 3}[cat]
        s = random.randrange(1, 13)
        pool = by_session[s]
        ev = random.sample(pool, n_ev)
        qtoks = []
        for (_, topic, uniq) in ev:
            qtoks += random.sample(uniq, 2)
        qtoks += random.sample(ev[0][1], 3)           # session topic words
        qtoks += [random.choice(VOCAB) for _ in range(2)]  # global noise
        random.shuffle(qtoks)
        qa.append({"qa_id": qa_id, "question": " ".join(qtoks),
                   "answer": "yes", "category": cat,
                   "evidence": [e[0] for e in ev], "adversarial_answer": ""})
    conversations.append({"conv_id": conv_id, "turns": turns, "qa": qa})

with open(sys.argv[1], "w") as f:
    for conv in conversations:
        f.write(json.dumps(conv) + "\n")
print(f"wrote {sys.argv[1]}: {len(conversations)} conversations, "
      f"{sum(len(c['turns']) for c in conversations)} turns, "
      f"{sum(len(c['qa']) for c in conversations)} qa")
