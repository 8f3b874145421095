#!/usr/bin/env python3
"""Dev-only: attribute Spark event-log stage task time to ScratchProf's
per-query job descriptions. Usage: ev_prof.py [evdir] [--rep N]"""
import json, glob, os, subprocess, sys, collections

pos = [a for a in sys.argv[1:] if not a.startswith('--')]
evdir = pos[0] if pos else '/tmp/spark-events'
rep = None
for a in sys.argv:
    if a.startswith('--rep'):
        rep = a.split('=')[1]
d = sorted(glob.glob(evdir + '/*'), key=os.path.getmtime)[-1]
f = glob.glob(d + '/events*')[0] if os.path.isdir(d) else d
if f.endswith('.zstd'):
    txt = subprocess.run(['zstd', '-d', '-c', f], capture_output=True).stdout.decode()
else:
    txt = open(f, encoding='utf-8', errors='replace').read()

job_desc = {}          # job id -> description
stage_job = {}         # stage id -> job id
stage_info = {}        # stage id -> (wall, ntasks, name)
stage_task_time = collections.Counter()  # stage id -> sum task run time
for line in txt.splitlines():
    try: e = json.loads(line)
    except ValueError: continue
    t = e.get('Event')
    if t == 'SparkListenerJobStart':
        desc = e.get('Properties', {}).get('spark.job.description', '')
        job_desc[e['Job ID']] = desc
        for s in e['Stage Infos']:
            stage_job[s['Stage ID']] = e['Job ID']
    elif t == 'SparkListenerStageCompleted':
        si = e['Stage Info']
        dur = (si.get('Completion Time', 0) - si.get('Submission Time', 0)) / 1000
        stage_info[si['Stage ID']] = (dur, si['Number of Tasks'], si['Stage Name'][:60])
    elif t == 'SparkListenerTaskEnd':
        ti = e.get('Task Info', {})
        stage_task_time[e['Stage ID']] += (ti.get('Finish Time', 0) - ti.get('Launch Time', 0)) / 1000

per_q = collections.defaultdict(lambda: [0.0, 0.0, 0, 0])  # desc -> [wall, tasktime, stages, tasks]
for sid, (dur, nt, name) in stage_info.items():
    desc = job_desc.get(stage_job.get(sid, -1), '(none)')
    if rep and not desc.endswith('#rep' + rep):
        continue
    q = desc.split('#')[0] if '#' in desc else desc
    per_q[q][0] += dur
    per_q[q][1] += stage_task_time[sid]
    per_q[q][2] += 1
    per_q[q][3] += nt
print(f"{'query':42s} {'stage-wall':>10s} {'task-time':>10s} {'stages':>6s} {'tasks':>6s}")
for q, (w, tt, ns, ntk) in sorted(per_q.items(), key=lambda x: -x[1][0]):
    print(f"{q:42s} {w:10.2f} {tt:10.2f} {ns:6d} {ntk:6d}")
# top stages per query (rep-filtered)
print('\ntop stages:')
rows = []
for sid, (dur, nt, name) in stage_info.items():
    desc = job_desc.get(stage_job.get(sid, -1), '(none)')
    if rep and not desc.endswith('#rep' + rep):
        continue
    rows.append((dur, stage_task_time[sid], nt, desc.split('#')[0], sid))
for dur, tt, nt, q, sid in sorted(rows, reverse=True)[:25]:
    print(f"  {dur:7.2f}s task={tt:7.2f}s n={nt:3d} stage={sid:4d} {q}")
