package graft.server.grpc

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.{ByteBuf, Unpooled}
import io.netty.channel._
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2._
import io.netty.util.ReferenceCountUtil

import graft.core._
import Pb._

/** gRPC adapter over the FactStore API — wire-compatible with the
  * reference's factstore-v1.proto services (StoreService :118-124,
  * FactService :204-238 incl. server-streaming SubscribeFacts/ReplayFacts
  * with typed pre-stream error envelopes :228-238, InfoService :423-433).
  *
  * Built directly on netty's HTTP/2 frame codec + the public gRPC wire
  * format (HTTP/2 POST per call; DATA carries 5-byte-prefixed protobuf
  * frames; trailers carry grpc-status): grpc-java/protoc are not available
  * in this environment, and the message set is small enough to encode by
  * hand ([[GrpcCodec]]). Business errors travel as oneof outcome messages,
  * exactly like the reference; only transport-level failures (unknown
  * method, malformed request) use gRPC status codes.
  *
  * Blocking store work (Spark jobs, subscription tail-polling) runs on a
  * cached thread pool, never on the event loop; server-stream writes go
  * through Channel.writeAndFlush, which is thread-safe.
  */
final class GrpcServer(store: FactStore, port: Int = 0,
    streamBatchSize: Int = 1000) {

  private val group = new MultiThreadIoEventLoopGroup(NioIoHandler.newFactory())
  private val pool = java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-grpc-worker"); t.setDaemon(true); t
  })
  private var channel: Channel = _

  def boundPort: Int =
    channel.localAddress().asInstanceOf[InetSocketAddress].getPort

  def start(): GrpcServer = {
    val b = new ServerBootstrap()
      .group(group)
      .channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[Channel] {
        override def initChannel(ch: Channel): Unit = {
          ch.pipeline().addLast(
            Http2FrameCodecBuilder.forServer().build(),
            new Http2MultiplexHandler(new ChannelInitializer[Channel] {
              override def initChannel(sc: Channel): Unit =
                sc.pipeline().addLast(new StreamHandler)
            }))
        }
      })
    channel = b.bind(new InetSocketAddress("127.0.0.1", port)).syncUninterruptibly().channel()
    this
  }

  def stop(): Unit = {
    if (channel != null) channel.close().syncUninterruptibly()
    pool.shutdownNow()
    group.shutdownGracefully(0, 500, java.util.concurrent.TimeUnit.MILLISECONDS)
  }

  // --- per-stream handler ----------------------------------------------------

  private val Svc = "/io.factstore.server.grpc"

  private final class StreamHandler extends ChannelInboundHandlerAdapter {
    private val body = new ByteArrayOutputStream()
    private var path: String = ""
    @volatile private var clientGone = false
    @volatile private var headersSent = false
    @volatile private var activeSub: Option[Subscription] = None
    // Handshake for stream flow control: a worker blocked on an unwritable
    // channel parks here; the event loop wakes it on writability change or
    // client cancel. No missed wakeup: the worker holds the monitor from
    // the isWritable check until wait() releases it, so the event loop's
    // notifyAll cannot slip in between.
    private val writable = new Object

    /** Park the worker until the stream channel drains (slow consumer) or
      * the client goes away — replaces a sleep-poll that held a pool
      * thread busy-waiting. The bounded wait is a belt-and-braces guard,
      * not the wakeup mechanism. */
    private def awaitWritable(ctx: ChannelHandlerContext): Unit =
      writable.synchronized {
        while (!clientGone && !ctx.channel().isWritable)
          writable.wait(500)
      }

    override def channelWritabilityChanged(ctx: ChannelHandlerContext): Unit = {
      writable.synchronized { writable.notifyAll() }
      ctx.fireChannelWritabilityChanged()
    }

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit = msg match {
      case h: Http2HeadersFrame =>
        path = String.valueOf(h.headers().path())
        if (h.isEndStream) submit(ctx)
      case d: Http2DataFrame =>
        try {
          val arr = new Array[Byte](d.content().readableBytes())
          d.content().readBytes(arr)
          body.write(arr)
          if (d.isEndStream) submit(ctx)
        } finally d.release()
      case _: Http2ResetFrame =>
        cancel()
      case other =>
        ReferenceCountUtil.release(other)
    }

    override def channelInactive(ctx: ChannelHandlerContext): Unit = {
      cancel()
      ctx.fireChannelInactive()
    }

    private def cancel(): Unit = {
      clientGone = true
      activeSub.foreach(_.close())
      writable.synchronized { writable.notifyAll() }
    }

    private def submit(ctx: ChannelHandlerContext): Unit =
      grpcMessages(body.toByteArray) match {
        case Left(err) =>
          // Framing errors get a proper gRPC status instead of a garbage
          // parse (zero-padded truncation) or an event-loop throw.
          trailersOnly(ctx, 3, s"malformed gRPC framing: $err") // INVALID_ARGUMENT
        case Right(msgs) =>
          val reqBytes = msgs.headOption.getOrElse(Array.emptyByteArray)
          pool.execute(() => run(ctx, path, reqBytes))
      }

    private def run(ctx: ChannelHandlerContext, path: String, raw: Array[Byte]): Unit =
      try {
        val m = Pb.parse(raw)
        path match {
          // --- StoreService ---------------------------------------------------
          case p if p == s"$Svc.StoreService/CreateStore" =>
            unary(ctx, GrpcCodec.createStoreResponse(store.createStore(str(m, 1))))
          case p if p == s"$Svc.StoreService/GetStore" =>
            unary(ctx, GrpcCodec.getStoreResponse(store.findStoreByName(str(m, 1)), str(m, 1)))
          case p if p == s"$Svc.StoreService/ListStores" =>
            unary(ctx, GrpcCodec.listStoresResponse(store.listStores()))
          case p if p == s"$Svc.StoreService/DeleteStore" =>
            unary(ctx, GrpcCodec.deleteStoreResponse(store.removeStore(str(m, 1)), str(m, 1)))
          case p if p == s"$Svc.StoreService/StoreExists" =>
            unary(ctx, GrpcCodec.storeExistsResponse(store.storeExists(str(m, 1))))

          // --- FactService ----------------------------------------------------
          case p if p == s"$Svc.FactService/AppendFacts" =>
            unary(ctx, GrpcCodec.appendResponse(store.append(GrpcCodec.readAppendRequest(m))))
          case p if p == s"$Svc.FactService/GetFact" =>
            unary(ctx, GrpcCodec.getFactResponse(store.findById(str(m, 1), str(m, 2))))
          case p if p == s"$Svc.FactService/FactExists" =>
            unary(ctx, GrpcCodec.factExistsResponse(store.existsById(str(m, 1), str(m, 2))))
          case p if p == s"$Svc.FactService/FindFactsBySubject" =>
            val (s, subject, limit, dir) = GrpcCodec.readBySubjectRequest(m)
            unary(ctx, GrpcCodec.findResponse(store.findBySubject(s, subject, limit, dir), s))
          case p if p == s"$Svc.FactService/FindFactsByTags" =>
            val (s, tags, limit, dir) = GrpcCodec.readByTagsRequest(m)
            unary(ctx, GrpcCodec.findResponse(store.findByTags(s, tags, limit, dir), s))
          case p if p == s"$Svc.FactService/QueryFacts" =>
            val (s, q) = GrpcCodec.readQueryFactsRequest(m)
            unary(ctx, GrpcCodec.findResponse(store.findByTagQuery(s, q), s))
          case p if p == s"$Svc.FactService/FindFactsInTimeRange" =>
            val (s, range, limit, dir) = GrpcCodec.readTimeRangeRequest(m)
            unary(ctx, GrpcCodec.findResponse(store.findInTimeRange(s, range, limit, dir), s))
          case p if p == s"$Svc.FactService/ReplayFacts" =>
            val (s, start) = GrpcCodec.readReplayRequest(m)
            store.replay(s, start, streamBatchSize) match {
              case Left(StreamError.StoreNotFound) =>
                streamOnce(ctx, GrpcCodec.streamStoreNotFound(s))
              case Left(StreamError.FactIdNotFound(_)) =>
                streamOnce(ctx, GrpcCodec.streamAfterFactNotFound)
              case Right(batches) =>
                writeHeaders(ctx)
                // Same flow control as SubscribeFacts: a large replay to a
                // slow client must not queue every frame in the child
                // channel's outbound buffer (that would hold the whole store
                // on the server heap, defeating the paged replay iterator).
                batches.foreach { b =>
                  awaitWritable(ctx)
                  if (!clientGone) writeMessage(ctx, GrpcCodec.streamBatch(b))
                }
                writeTrailers(ctx, 0)
            }
          case p if p == s"$Svc.FactService/SubscribeFacts" =>
            val (s, start) = GrpcCodec.readSubscribeRequest(m)
            store.subscribe(s, start, streamBatchSize) match {
              case Left(StreamError.StoreNotFound) =>
                streamOnce(ctx, GrpcCodec.streamStoreNotFound(s))
              case Left(StreamError.FactIdNotFound(_)) =>
                streamOnce(ctx, GrpcCodec.streamAfterFactNotFound)
              case Right(sub) =>
                activeSub = Some(sub)
                writeHeaders(ctx)
                try {
                  // never completes on its own (reference FactService
                  // SubscribeFacts contract); ends when the client cancels.
                  // Flow control: park this worker while the stream channel
                  // is unwritable (slow consumer) instead of buffering the
                  // tail unboundedly in netty's outbound queue.
                  while (!clientGone && sub.hasNext) {
                    val batch = sub.next()
                    awaitWritable(ctx)
                    if (!clientGone) writeMessage(ctx, GrpcCodec.streamBatch(batch))
                  }
                } catch { case _: NoSuchElementException => () /* closed */ }
                finally sub.close()
            }

          // --- InfoService ----------------------------------------------------
          case p if p == s"$Svc.InfoService/GetServerInfo" =>
            unary(ctx, GrpcCodec.serverInfoResponse("graft", "0.1.0", "spark-parquet-log"))

          case other =>
            trailersOnly(ctx, 12, s"unknown method: $other") // UNIMPLEMENTED
        }
      } catch {
        case e: IllegalArgumentException =>
          failStream(ctx, 3, String.valueOf(e.getMessage)) // INVALID_ARGUMENT
        case _: InterruptedException => ()
        case e: Throwable =>
          failStream(ctx, 13, String.valueOf(e.getMessage)) // INTERNAL
      }

    /** Error path that respects HTTP/2 framing: before any response HEADERS
      * have gone out, a trailers-only response is legal; after them, a
      * second `:status` pseudo-header would be a protocol violation, so the
      * stream must end with plain trailers carrying the grpc-status. */
    private def failStream(ctx: ChannelHandlerContext, status: Int, msg: String): Unit =
      if (headersSent) writeTrailers(ctx, status, msg)
      else trailersOnly(ctx, status, msg)

    private def unary(ctx: ChannelHandlerContext, response: Array[Byte]): Unit = {
      writeHeaders(ctx)
      writeMessage(ctx, response)
      writeTrailers(ctx, 0)
    }

    /** Pre-stream business error: one envelope message, then normal end. */
    private def streamOnce(ctx: ChannelHandlerContext, envelope: Array[Byte]): Unit = {
      writeHeaders(ctx)
      writeMessage(ctx, envelope)
      writeTrailers(ctx, 0)
    }

    private def writeHeaders(ctx: ChannelHandlerContext): Unit = {
      val h = new DefaultHttp2Headers().status("200")
      h.set("content-type", "application/grpc")
      headersSent = true
      ctx.channel().writeAndFlush(new DefaultHttp2HeadersFrame(h))
    }

    private def writeMessage(ctx: ChannelHandlerContext, m: Array[Byte]): Unit =
      ctx.channel().writeAndFlush(new DefaultHttp2DataFrame(grpcFrame(m)))

    private def writeTrailers(ctx: ChannelHandlerContext, status: Int, msg: String = ""): Unit = {
      val t = new DefaultHttp2Headers()
      t.set("grpc-status", status.toString)
      if (msg.nonEmpty) t.set("grpc-message", msg)
      ctx.channel().writeAndFlush(new DefaultHttp2HeadersFrame(t, true))
    }

    /** Transport error with no body: response headers double as trailers. */
    private def trailersOnly(ctx: ChannelHandlerContext, status: Int, msg: String): Unit = {
      val h = new DefaultHttp2Headers().status("200")
      h.set("content-type", "application/grpc")
      h.set("grpc-status", status.toString)
      if (msg.nonEmpty) h.set("grpc-message", msg)
      ctx.channel().writeAndFlush(new DefaultHttp2HeadersFrame(h, true))
    }
  }

  // --- gRPC message framing: 1-byte compressed flag + u32 big-endian length --

  private def grpcFrame(m: Array[Byte]): ByteBuf = {
    val b = Unpooled.buffer(5 + m.length)
    b.writeByte(0)
    b.writeInt(m.length)
    b.writeBytes(m)
    b
  }

  /** Strict frame walk: every declared length must lie fully inside the
    * body. Truncated or negative-length frames are rejected (Left) rather
    * than zero-padded into a garbage-but-parseable request or thrown on
    * the event loop. */
  private def grpcMessages(b: Array[Byte]): Either[String, Vector[Array[Byte]]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var i = 0
    while (i < b.length) {
      if (i + 5 > b.length)
        return Left(s"truncated frame header at byte $i of ${b.length}")
      val len = ((b(i + 1) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
        ((b(i + 3) & 0xff) << 8) | (b(i + 4) & 0xff)
      if (len < 0)
        return Left(s"negative frame length $len at byte $i")
      if (i + 5 + len > b.length)
        return Left(s"truncated frame body at byte $i: declared $len, have ${b.length - i - 5}")
      out += java.util.Arrays.copyOfRange(b, i + 5, i + 5 + len)
      i += 5 + len
    }
    Right(out.result())
  }
}
