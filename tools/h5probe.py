#!/usr/bin/env python3
"""Structure prober for HDF5 classic files (superblock v0) — maps what
h5py emits in the reference's golden output so graft.io.HDF5's reader
can be extended to parse it. Public file-format spec: HDF5 File Format
Specification Version 3.0 (HDF Group)."""
import struct, sys

path = sys.argv[1]
data = open(path, 'rb').read()

def u16(o): return struct.unpack_from('<H', data, o)[0]
def u32(o): return struct.unpack_from('<I', data, o)[0]
def u64(o): return struct.unpack_from('<Q', data, o)[0]

assert data[:8] == b'\x89HDF\r\n\x1a\n'
sbver = data[8]
print(f'superblock v{sbver}, leafK={u16(13)}, internalK={u16(15)}')
print(f'eof={u64(0x28):#x} filelen={len(data):#x}')
# root symbol table entry at 0x18 for v0 (after 24-byte fixed part? actually 0x18+...)
# v0 layout: sig8 + ver4 bytes(8..11) + reserved... root STE at offset 0x18? We know: 0x38 link name, 0x40 OH
rootOh = u64(0x40)
cache = u32(0x48)
btree, heap = u64(0x50), u64(0x58)
print(f'root OH={rootOh:#x} cache={cache} btree={btree:#x} heap={heap:#x}')

def heap_str(heap_addr, off):
    assert data[heap_addr:heap_addr+4] == b'HEAP'
    dseg = u64(heap_addr+24)
    s = dseg + off
    e = data.index(b'\x00', s)
    return data[s:e].decode()

MSG = {0x0000:'NIL',0x0001:'dataspace',0x0002:'linkinfo',0x0003:'datatype',
       0x0004:'fill_old',0x0005:'fill',0x0008:'layout',0x000A:'groupinfo',
       0x000B:'pipeline',0x000C:'attribute',0x000D:'comment',0x0010:'continuation',
       0x0011:'symboltable',0x0012:'modtime',0x0015:'attrinfo',0x0016:'refcount'}

def parse_oh(addr, name=''):
    if data[addr:addr+4] == b'OHDR':
        return parse_oh2(addr, name)
    ver = data[addr]
    assert ver == 1, f'OH version {ver} at {addr:#x}'
    nmsgs = u16(addr+2)
    hdrsize = u32(addr+8)
    print(f'  OH@{addr:#x} v1 nmsgs={nmsgs} hdrsize={hdrsize}')
    msgs = []
    # blocks: (start, size). first block starts at addr+16 per spec v0? h5py: addr+16.
    blocks = [(addr+16, hdrsize)]
    got = 0
    bi = 0
    while bi < len(blocks) and got < nmsgs:
        pos, size = blocks[bi]
        end = pos + size
        while pos + 8 <= end and got < nmsgs:
            t = u16(pos); sz = u16(pos+2); fl = data[pos+4]
            body = pos+8
            print(f'    msg {MSG.get(t,hex(t))} size={sz} flags={fl} @body={body:#x}')
            if t == 0x0010:
                cont_addr = u64(body); cont_len = u64(body+8)
                print(f'      continuation -> @{cont_addr:#x} len={cont_len}')
                blocks.append((cont_addr, cont_len))
            msgs.append((t, body, sz))
            pos = body + sz
            got += 1
        bi += 1
    dump_msgs(msgs)

def parse_oh2(addr, name=''):
    flags = data[addr+5]
    p = addr + 6
    if flags & 0x20: p += 16  # times
    if flags & 0x10: p += 4   # phase change
    szbytes = 1 << (flags & 3)
    chunk0 = int.from_bytes(data[p:p+szbytes], 'little'); p += szbytes
    tracked = bool(flags & 0x04)
    print(f'  OHDR@{addr:#x} v2 flags={flags:#x} chunk0={chunk0} tracked={tracked}')
    msgs = []
    blocks = [(p, chunk0)]
    bi = 0
    while bi < len(blocks):
        pos, size = blocks[bi]
        end = pos + size - 0  # chunk size excludes checksum? v2: size includes msgs only; gap+checksum after
        while pos + 4 <= end:
            t = data[pos]; sz = u16(pos+1); fl = data[pos+3]
            body = pos + 4 + (2 if tracked else 0)
            print(f'    msg {MSG.get(t,hex(t))} size={sz} flags={fl} @body={body:#x}')
            if t == 0x10:
                cont_addr = u64(body); cont_len = u64(body+8)
                print(f'      continuation -> @{cont_addr:#x} len={cont_len}')
                # OCHK: sig(4) ... checksum(4)
                blocks.append((cont_addr+4, cont_len-8))
            msgs.append((t, body, sz))
            pos = body + sz
        bi += 1
    dump_msgs(msgs)

def dump_msgs(msgs):
    for t, body, sz in msgs:
        if t == 0x0006:
            lv = data[body]; lfl = data[body+1]
            p = body + 2
            if lfl & 0x08: p += 1  # link type
            if lfl & 0x04: p += 8  # creation order
            if lfl & 0x10: p += 1  # charset
            lsz = 1 << (lfl & 3)
            nlen = int.from_bytes(data[p:p+lsz], 'little'); p += lsz
            lname = data[p:p+nlen].decode(); p += nlen
            tgt = u64(p)
            print(f'    link "{lname}" -> OH@{tgt:#x}')
        elif t == 0x0001:
            v = data[body]; rank = data[body+1]; flags = data[body+2]
            if v == 1:
                dims = [u64(body+8+8*i) for i in range(rank)]
            else:
                dims = [u64(body+4+8*i) for i in range(rank)]
            print(f'    dataspace v{v} rank={rank} flags={flags} dims={dims}')
        elif t == 0x0003:
            cv = data[body]; cls = cv & 0xf; dtver = cv >> 4
            b0,b1,b2 = data[body+1],data[body+2],data[body+3]
            size = u32(body+4)
            print(f'    datatype v{dtver} class={cls} bits=({b0:#x},{b1:#x},{b2:#x}) size={size}')
        elif t == 0x0005:
            v = data[body]
            print(f'    fill v{v} bytes={data[body:body+8].hex()}')
        elif t == 0x0008:
            v = data[body]
            if v == 3:
                lc = data[body+1]
                if lc == 1:
                    print(f'    layout v3 contiguous addr={u64(body+2):#x} size={u64(body+10)}')
                else:
                    print(f'    layout v3 class={lc}')
            else:
                print(f'    layout v{v} raw={data[body:body+24].hex()}')
        elif t == 0x000C:
            av = data[body]
            nsz = u16(body+2); dtsz = u16(body+4); dssz = u16(body+6)
            aname = data[body+8:body+8+nsz].split(b'\x00')[0].decode()
            def pad8(n): return (n+7)&~7
            dto = body+8+pad8(nsz)
            cv = data[dto]; cls = cv & 0xf
            asize = u32(dto+4)
            dso = dto + pad8(dtsz)
            arank = data[dso+1]
            adims = [u64(dso+8+8*i) for i in range(arank)] if data[dso]==1 else []
            ado = dso + pad8(dssz)
            raw = data[ado:ado+asize*(max(1,1 if not adims else adims[0]))]
            show = raw[:32]
            if cls == 3:
                val = show.split(b'\x00')[0].decode('ascii','replace')
            elif cls == 1 and asize == 8:
                val = struct.unpack_from('<d', data, ado)[0]
            elif cls == 0 and asize <= 8:
                val = int.from_bytes(data[ado:ado+asize],'little')
            else:
                val = show.hex()
            print(f'    attr v{av} "{aname}" cls={cls} size={asize} dims={adims} val={val!r}')
        elif t == 0x0011:
            bt, hp = u64(body), u64(body+8)
            print(f'    symboltable btree={bt:#x} heap={hp:#x}')
            walk_group(bt, hp)

def walk_group(btree_addr, heap_addr):
    def walk(addr):
        assert data[addr:addr+4] == b'TREE', data[addr:addr+4]
        ntype, level = data[addr+4], data[addr+5]
        used = u16(addr+6)
        print(f'TREE@{addr:#x} type={ntype} level={level} used={used}')
        kids = []
        p = addr + 24
        for i in range(used):
            key = u64(p); child = u64(p+8); p += 16
            kids.append(child)
        for c in kids:
            if level == 0:
                snod(c)
            else:
                walk(c)
    def snod(addr):
        assert data[addr:addr+4] == b'SNOD'
        n = u16(addr+6)
        print(f'SNOD@{addr:#x} n={n}')
        p = addr + 8
        for i in range(n):
            noff = u64(p); oh = u64(p+8); ct = u32(p+16)
            name = heap_str(heap_addr, noff)
            print(f'  entry "{name}" OH@{oh:#x} cache={ct}')
            p += 40
        p = addr + 8
        for i in range(n):
            noff = u64(p); oh = u64(p+8)
            name = heap_str(heap_addr, noff)
            print(f'--- dataset/group "{name}"')
            parse_oh(oh, name)
            p += 40
    walk(btree_addr)

print('--- root group')
parse_oh(rootOh)
